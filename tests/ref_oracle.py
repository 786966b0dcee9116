"""Load the reference (torch) quantizers as a black-box numeric oracle.

Used ONLY by tests to check bit-exact parity of our JAX quantizers against
the reference implementation at /root/reference (read-only mount). No
reference code is copied into this repo; the modules are imported in place
via importlib. Tests that use this oracle skip cleanly when the mount or
torch is unavailable.
"""

import importlib.util
import sys
import types
from pathlib import Path

_REF_QUANTIZERS = Path("/root/reference/src/lqer/quantize/quantizers")


def load_reference_quantizers():
    """Return the reference quantizers package (or None if unavailable)."""
    if not _REF_QUANTIZERS.is_dir():
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None

    pkg_name = "_lqer_ref_quantizers"
    if pkg_name in sys.modules:
        return sys.modules[pkg_name]

    pkg = types.ModuleType(pkg_name)
    pkg.__path__ = [str(_REF_QUANTIZERS)]
    sys.modules[pkg_name] = pkg

    for mod in ["utils", "block_fp", "integer", "minifloat", "passthrough"]:
        spec = importlib.util.spec_from_file_location(
            f"{pkg_name}.{mod}", _REF_QUANTIZERS / f"{mod}.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"{pkg_name}.{mod}"] = m
        spec.loader.exec_module(m)
        setattr(pkg, mod, m)

    return pkg
