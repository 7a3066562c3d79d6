from upmix_tpu.models.offline import Upmixer, upmix_offline

__all__ = ["Upmixer", "upmix_offline"]
