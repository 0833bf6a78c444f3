from .instance_norm import fused_instance_norm_act, pallas_available

__all__ = ["fused_instance_norm_act", "pallas_available"]
