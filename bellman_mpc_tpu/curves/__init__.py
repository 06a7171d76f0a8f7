from .host import G1, G2, CurveGroup, FP_OPS, FP2_OPS

__all__ = ["G1", "G2", "CurveGroup", "FP_OPS", "FP2_OPS"]
