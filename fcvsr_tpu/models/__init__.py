from .fcvsr import FCVSRNet, MFFR, MGAA, fcvsr_etc_forward

__all__ = ["FCVSRNet", "MFFR", "MGAA", "fcvsr_etc_forward"]
