from tpuseg.decoder.pyramid import AttenDecoder
from tpuseg.decoder.instance import InstanceDecoder

__all__ = ["AttenDecoder", "InstanceDecoder"]
