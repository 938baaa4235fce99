"""Import helper for the reference's torch loss modules.

Used ONLY by parity tests: numerically compares our jnp losses against the
reference implementations executed with torch-cpu.  The reference uses a
flat sys.path import scheme with a circular ``losses``/``dice`` import
that only resolves in its original import order; this helper reproduces a
working order by pre-registering the flat modules under the package names.
"""

import importlib
import sys
import types

_REF = "/root/reference/code/lib"
_PATHS = [_REF, _REF + "/losses", _REF + "/archs/modules"]


def load_reference_losses():
    for p in _PATHS:
        if p not in sys.path:
            sys.path.insert(0, p)
    if "losses" in sys.modules and hasattr(sys.modules["losses"], "__tpuseg_shim__"):
        pass
    else:
        multi_loss = importlib.import_module("multi_loss")
        pkg = types.ModuleType("losses")
        pkg.__path__ = [_REF + "/losses"]
        pkg.__tpuseg_shim__ = True
        sys.modules["losses"] = pkg
        sys.modules["losses.multi_loss"] = multi_loss
        pkg.multi_loss = multi_loss
    dice = importlib.import_module("dice")
    lovasz = importlib.import_module("lovasz_losses")
    discriminative = importlib.import_module("discriminative")
    multi_loss = sys.modules["losses.multi_loss"]
    return types.SimpleNamespace(
        dice=dice, lovasz=lovasz, discriminative=discriminative,
        multi_loss=multi_loss,
    )
