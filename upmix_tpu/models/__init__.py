from upmix_tpu.models.offline import Upmixer, upmix_offline
from upmix_tpu.models.streaming import BatchStreamingUpmixer, StreamingUpmixer

__all__ = ["Upmixer", "upmix_offline", "StreamingUpmixer", "BatchStreamingUpmixer"]
