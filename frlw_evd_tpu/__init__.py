"""frlw_evd_tpu — a TPU-native event-camera object-detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of HarmoniaLeo/FRLW-EvD
(IEEE TIM 2023): Prophesee event-stream I/O, four dense event representations
(Event Count Image, Surface of Active Events, Event Volume, Temporal Active
Focus) as fused on-device kernels, the AED / YOLOX / YOLOv3 detector families
with the TAF Bins-Fusion-Module stem, mesh-sharded training, and a
bit-compatible Prophesee COCO evaluation pipeline.

Layering (bottom → top), mirroring SURVEY.md §7:
    events/    event file codecs + seekable readers (CPU, numpy)
    encode/    event → dense-volume encoders (jitted XLA / Pallas kernels)
    data/      datasets, augmentation, host loading, streaming fetcher
    models/    flax model zoo (backbones, necks, heads, stems, memory)
    train/     config, schedules, trainer, checkpointing
    parallel/  mesh / sharding utilities
    evaluate/  Prophesee-compatible COCO mAP evaluator
    utils/     logging, metrics, profiling
"""

__version__ = "0.1.0"

import os as _os

_envp = _os.environ.get("JAX_PLATFORMS")
if _envp:
    # Some PJRT plugin loaders (e.g. the axon TPU plugin's sitecustomize)
    # prepend their platform to jax.config.jax_platforms at interpreter
    # start, silently overriding the documented JAX_PLATFORMS env contract
    # ("cpu" becomes "axon,cpu" and subprocesses land on the TPU). Restore
    # the env's explicit choice before any backend initialises — but ONLY
    # when the current value looks plugin-prepended (ends with the env
    # choice), so a deliberate programmatic jax.config.update made before
    # importing this package is never clobbered. No-op once backends exist.
    import jax as _jax

    try:
        from jax._src import xla_bridge as _xb

        _inited = bool(getattr(_xb, "_backends", {}))
    except Exception:  # private API moved: assume not yet initialised
        _inited = False
    _cur = _jax.config.jax_platforms
    if _cur != _envp and _cur and _cur.endswith(_envp) and not _inited:
        _jax.config.update("jax_platforms", _envp)
    del _jax, _cur, _inited
del _os
