"""ARKit blendshape vocabulary and dual-stream index split.

The 52-name ARKit vocabulary and the mouth/expression split mirror the
reference semantics (reference: src/model/dual_stream_attention.py:14-45):
28 mouth blendshapes (4 jaw + 23 mouth + tongueOut) are driven by the mel
stream; the remaining 24 expression blendshapes by the emotion stream.
"""

from __future__ import annotations

import numpy as np

# Canonical ARKit order (reference: src/model/dual_stream_attention.py:29-41).
ARKIT_BLENDSHAPES: tuple[str, ...] = (
    "eyeBlinkLeft", "eyeLookDownLeft", "eyeLookInLeft", "eyeLookOutLeft",
    "eyeLookUpLeft", "eyeSquintLeft", "eyeWideLeft", "eyeBlinkRight",
    "eyeLookDownRight", "eyeLookInRight", "eyeLookOutRight", "eyeLookUpRight",
    "eyeSquintRight", "eyeWideRight", "jawForward", "jawLeft", "jawRight",
    "jawOpen", "mouthClose", "mouthFunnel", "mouthPucker", "mouthLeft",
    "mouthRight", "mouthSmileLeft", "mouthSmileRight", "mouthFrownLeft",
    "mouthFrownRight", "mouthDimpleLeft", "mouthDimpleRight",
    "mouthStretchLeft", "mouthStretchRight", "mouthRollLower",
    "mouthRollUpper", "mouthShrugLower", "mouthShrugUpper", "mouthPressLeft",
    "mouthPressRight", "mouthLowerDownLeft", "mouthLowerDownRight",
    "mouthUpperUpLeft", "mouthUpperUpRight", "browDownLeft", "browDownRight",
    "browInnerUp", "browOuterUpLeft", "browOuterUpRight", "cheekPuff",
    "cheekSquintLeft", "cheekSquintRight", "noseSneerLeft", "noseSneerRight",
    "tongueOut",
)

NUM_BLENDSHAPES: int = len(ARKIT_BLENDSHAPES)
assert NUM_BLENDSHAPES == 52

# Mouth-stream names (reference: src/model/dual_stream_attention.py:14-26).
MOUTH_BLENDSHAPES: tuple[str, ...] = (
    # Jaw movements
    "jawForward", "jawLeft", "jawRight", "jawOpen",
    # Mouth shapes
    "mouthClose", "mouthFunnel", "mouthPucker", "mouthLeft", "mouthRight",
    "mouthSmileLeft", "mouthSmileRight", "mouthFrownLeft", "mouthFrownRight",
    "mouthDimpleLeft", "mouthDimpleRight", "mouthStretchLeft",
    "mouthStretchRight", "mouthRollLower", "mouthRollUpper",
    "mouthShrugLower", "mouthShrugUpper", "mouthPressLeft", "mouthPressRight",
    "mouthLowerDownLeft", "mouthLowerDownRight", "mouthUpperUpLeft",
    "mouthUpperUpRight",
    # Tongue (visible tongue affects mouth shape)
    "tongueOut",
)

_mouth_set = frozenset(MOUTH_BLENDSHAPES)

# Derived index splits (reference: src/model/dual_stream_attention.py:44-45).
MOUTH_INDICES: tuple[int, ...] = tuple(
    i for i, name in enumerate(ARKIT_BLENDSHAPES) if name in _mouth_set
)
EXPRESSION_INDICES: tuple[int, ...] = tuple(
    i for i in range(NUM_BLENDSHAPES) if i not in set(MOUTH_INDICES)
)

NUM_MOUTH: int = len(MOUTH_INDICES)          # 28
NUM_EXPRESSION: int = len(EXPRESSION_INDICES)  # 24
assert NUM_MOUTH == 28 and NUM_EXPRESSION == 24


def mouth_index_array() -> np.ndarray:
    """Mouth indices as an int32 numpy array (for device scatter/gather)."""
    return np.asarray(MOUTH_INDICES, dtype=np.int32)


def expression_index_array() -> np.ndarray:
    """Expression indices as an int32 numpy array."""
    return np.asarray(EXPRESSION_INDICES, dtype=np.int32)


def blendshape_index(name: str) -> int:
    """Index of a blendshape by its ARKit name. Raises ValueError if unknown."""
    try:
        return ARKIT_BLENDSHAPES.index(name)
    except ValueError as exc:  # pragma: no cover - defensive
        raise ValueError(f"Unknown ARKit blendshape: {name!r}") from exc


# Frequency-band groupings of the 80 mel channels, used by attention
# visualization (reference: src/model/dual_stream_attention.py:282-294).
FREQUENCY_BANDS: dict[str, tuple[int, int]] = {
    "low": (0, 20),        # voice fundamental
    "mid_low": (20, 40),
    "mid_high": (40, 60),
    "high": (60, 80),      # consonants
}
