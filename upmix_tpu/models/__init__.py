from upmix_tpu.models.offline import Upmixer, upmix_offline
from upmix_tpu.models.streaming import (
    BatchStreamingUpmixer,
    PallasStreamPool,
    StreamingUpmixer,
    make_stream_pool,
)

__all__ = [
    "Upmixer",
    "upmix_offline",
    "StreamingUpmixer",
    "BatchStreamingUpmixer",
    "PallasStreamPool",
    "make_stream_pool",
]
