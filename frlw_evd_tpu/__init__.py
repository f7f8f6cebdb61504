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
