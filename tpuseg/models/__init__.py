from tpuseg.models.reseg import ReSeg

__all__ = ["ReSeg"]
