__all__ = ["MidasSmall", "MidasV21", "DPT"]


def __getattr__(name):
    if name == "MidasSmall":
        from depth_estimation_tpu.models.midas_small import MidasSmall

        return MidasSmall
    if name == "MidasV21":
        from depth_estimation_tpu.models.midas_v21 import MidasV21

        return MidasV21
    if name == "DPT":
        from depth_estimation_tpu.models.dpt import DPT

        return DPT
    raise AttributeError(name)
