__all__ = ["MidasSmall", "DPT"]


def __getattr__(name):
    if name == "MidasSmall":
        from depth_estimation_tpu.models.midas_small import MidasSmall

        return MidasSmall
    if name == "DPT":
        from depth_estimation_tpu.models.dpt import DPT

        return DPT
    raise AttributeError(name)
