from .torch_import import convert_torch_state_dict, flax_to_torch_key

__all__ = ["convert_torch_state_dict", "flax_to_torch_key"]
