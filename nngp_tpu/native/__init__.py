from nngp_tpu.native.fastenc import (
    FastEncoder,
    is_available,
)

__all__ = ["FastEncoder", "is_available"]
