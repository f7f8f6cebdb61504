"""Event-stream encoders: raw (x, y, t, p) events → dense uint8/float volumes.

Four representations (reference: generate_*.py, data/sparse_ops.py):
  * Event Count Image (ECI)      — occupancy of the last-N events
  * Surface of Active Events     — exp-decayed last-event timestamps (3 λ)
  * Event Volume (EV)            — bilinear temporal splat onto 5 bins
  * Temporal Active Focus (TAF)  — per-pixel K-deep FIFO of 10 ms activity

`oracle` holds the numpy sequential reference implementations (bit-exact with
the reference math) used for parity tests and offline generation; the sibling
modules hold the jitted TPU encoders (static shapes, padded event buffers,
XLA scatter / Pallas kernels) with identical channel semantics.
"""

from .common import (
    events_struct_to_xytp,
    pad_events,
    nearest_resize_chw,
)
from .event_volume import encode_event_volume, encode_event_volume_batch
from .count_image import encode_count_image, encode_count_image_batch
from .sae import encode_sae, encode_sae_batch
from .taf import taf_bin_step, encode_taf_window, taf_init_state, leaky_transform
from . import oracle
from .mxu_scatter import scatter_add_mxu, scatter_cnt_tsum_mxu
from . import streaming
