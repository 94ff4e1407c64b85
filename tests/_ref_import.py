"""Import reference modules from the read-only mount WITHOUT sys.path
pollution.

The reference `lib/` directory is a namespace package with a maximally
generic name; prepending /root/reference to sys.path would (a) let `import
lib` shadow/collide with any other importable named `lib` and (b) make the
whole untrusted mount importable. Instead we register an explicit alias
package `_wealy_ref_lib` whose __path__ points at the mount's lib/ dir, and
import submodules through it — relative imports inside the reference resolve
against the alias, and nothing else on the mount is reachable.
"""

from __future__ import annotations

import importlib
import pathlib
import sys
import types

REF = pathlib.Path("/root/reference")
_ALIAS = "_wealy_ref_lib"


def ref_exists(rel: str) -> bool:
    return (REF / "lib" / rel).exists()


def import_ref(dotted: str):
    """Import e.g. 'tensor_ops' or 'embedding_dataset.base_dataset' from the
    reference's lib/ by alias package. Raises ImportError on failure."""
    if _ALIAS not in sys.modules:
        pkg = types.ModuleType(_ALIAS)
        pkg.__path__ = [str(REF / "lib")]
        pkg.__package__ = _ALIAS
        sys.modules[_ALIAS] = pkg
    return importlib.import_module(f"{_ALIAS}.{dotted}")
