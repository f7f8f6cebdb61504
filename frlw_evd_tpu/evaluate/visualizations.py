"""In-loop tensor→PNG renderers (reference: evaluate/visualizations.py).

Render an encoded representation with GT/DT boxes during evaluation —
lightweight hooks for debugging a running experiment; the full offline
renderer lives in tools/visualization.py.
"""

from __future__ import annotations

import os

import numpy as np


def _to_image(volume: np.ndarray) -> np.ndarray:
    """(C, H, W) float → uint8 heat image (mean over channels)."""
    img = volume.mean(0)
    img = img / max(float(img.max()), 1e-8) * 255.0
    return img.astype(np.uint8)


def _draw_boxes(img, boxes, color):
    import cv2

    for row in boxes:
        x1, y1 = int(row[0] - row[2] / 2), int(row[1] - row[3] / 2)
        x2, y2 = int(row[0] + row[2] / 2), int(row[1] + row[3] / 2)
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 1)
    return img


def visualize_volume(volume, gt, dt, filename, path, time_stamp_end):
    """Event Volume + boxes → <path>/<stream>_<ts>.png
    (reference visualizeVolume:30). volume (C, H, W); gt/dt rows cxcywh."""
    import cv2

    os.makedirs(path, exist_ok=True)
    img = cv2.applyColorMap(_to_image(np.asarray(volume)), cv2.COLORMAP_JET)
    img = _draw_boxes(img, np.asarray(gt), (0, 255, 0))
    if dt is not None and len(dt):
        img = _draw_boxes(img, np.asarray(dt), (0, 0, 255))
    out = os.path.join(path, f"{filename}_{int(time_stamp_end)}.png")
    cv2.imwrite(out, img)
    return out


def visualize_taf(volume, gt, dt, filename, path, time_stamp_end):
    """TAF representation render (reference visualize_taf:49): shows the
    newest bin pair rather than the channel mean."""
    import cv2

    os.makedirs(path, exist_ok=True)
    vol = np.asarray(volume)
    img = cv2.applyColorMap(_to_image(vol[:2]), cv2.COLORMAP_JET)
    img = _draw_boxes(img, np.asarray(gt), (0, 255, 0))
    if dt is not None and len(dt):
        img = _draw_boxes(img, np.asarray(dt), (0, 0, 255))
    out = os.path.join(path, f"{filename}_{int(time_stamp_end)}_taf.png")
    cv2.imwrite(out, img)
    return out


class Visualizer:
    """Callable hook collecting renders during an eval epoch (reference
    visualizer:81)."""

    def __init__(self, path: str, renderer=visualize_volume):
        self.path = path
        self.renderer = renderer

    def __call__(self, volume, gt, dt, filename, time_stamp_end):
        return self.renderer(volume, gt, dt, filename, self.path,
                             time_stamp_end)
