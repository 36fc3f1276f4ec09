from fm3dgan.pipeline.forward import (
    CO_MODULATION_MODE,
    MODULATION_ENCODING,
    FaceManipulator,
    forward_2_encoder,
    forward_3_encoder,
)

__all__ = [
    "CO_MODULATION_MODE",
    "MODULATION_ENCODING",
    "FaceManipulator",
    "forward_2_encoder",
    "forward_3_encoder",
]
