from ubdvss_tpu.models.model import BarcodeFCN, SeparableConv, get_model, init_params, param_count

__all__ = ["BarcodeFCN", "SeparableConv", "get_model", "init_params", "param_count"]
