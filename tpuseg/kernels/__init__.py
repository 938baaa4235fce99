from tpuseg.kernels.sru_scan import sru_scan_pallas
from tpuseg.kernels.masked_softmax import masked_softmax_pallas

__all__ = ["sru_scan_pallas", "masked_softmax_pallas"]
