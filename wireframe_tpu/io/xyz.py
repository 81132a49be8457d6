"""`.xyz` LiDAR point-cloud ingest.

File format (reference README.md:40-55): whitespace-separated rows of
``X Y Z R G B A Intensity`` floats.  Primary path is the C++ native
parser (`wireframe_tpu.io.native`, single strtod pass over a read-once
buffer) feeding the async ingest pipeline; ``np.loadtxt`` is the
fallback.  Both produce identical float64 arrays (unit-tested).
"""

from __future__ import annotations

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native_parser():
    """Lazily load the C++ parser; fall back to numpy when unavailable."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from wireframe_tpu.io.native import parse_xyz_native
            _NATIVE = parse_xyz_native
        except Exception:
            _NATIVE = None
    return _NATIVE


def read_xyz(path: str, use_native: bool = True) -> np.ndarray:
    """Read an .xyz file into an (N, C) float64 array.

    C is inferred from the first row (8 for the Building3D corpus).
    """
    native = _native_parser() if use_native else None
    if native is not None:
        out = native(path)
        if out is not None:
            return out
    return np.loadtxt(path, dtype=np.float64, ndmin=2)


def select_features(pc: np.ndarray, use_color: bool, use_intensity: bool,
                    scale_intensity: bool = False) -> np.ndarray:
    """Channel selection + color scaling.

    Matches datasets/building3d.py:102-111: RGBA divided by 256 and — when
    `scale_intensity=False` — the raw intensity column left unscaled
    (SURVEY.md §7 quirk 3).  The corpus intensity is ~46-48k, which at
    LeCun-init scale drowns the unit-sphere geometry channels by ~3
    orders of magnitude at the first layer; `scale_intensity=True`
    (the framework default via DataConfig.scale_intensity) divides by
    2^16, the 16-bit LiDAR range.  The reference's `use_intensity and not
    use_color` branch crashes on a 1-D concatenate (building3d.py:108);
    fixed here (quirk 2).
    """
    pc = np.array(pc, dtype=np.float64, copy=True)
    denom = 65536.0 if scale_intensity else 1.0
    if not use_color and not use_intensity:
        return pc[:, 0:3]
    if use_color and not use_intensity:
        out = pc[:, 0:7]
        out[:, 3:] = out[:, 3:] / 256.0
        return out
    if not use_color and use_intensity:
        return np.concatenate((pc[:, 0:3], pc[:, 7:8] / denom), axis=1)
    out = pc
    out[:, 3:7] = out[:, 3:7] / 256.0
    out[:, 7] = out[:, 7] / denom
    return out
