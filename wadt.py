"""Short import alias for the framework package.

``import wadt`` re-binds this module to the real package
``heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu``,
and a meta-path redirect makes every ``wadt.<sub>`` import resolve to the
SAME module object as the real name.  Without the redirect, ``import
wadt.ops.x`` / ``from wadt.ops import x`` would re-execute the package's
files a second time under the alias name (Python imports by dotted name,
not by file), yielding duplicate modules with separate globals — broken
isinstance checks, forked module state, and order-dependent ImportErrors.
"""

import importlib
import importlib.abc
import importlib.util
import sys

import heuristic_style_transfer_for_real_time_efficient_weather_attribute_detection_tpu as _pkg

_REAL = _pkg.__name__


class _AliasRedirect(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Resolve ``wadt.<sub>`` to the already-singleton real module."""

    def __init__(self):
        self._saved = {}

    def find_spec(self, fullname, path=None, target=None):
        if fullname != "wadt" and not fullname.startswith("wadt."):
            return None
        # Only claim names whose REAL counterpart exists — otherwise
        # ``importlib.util.find_spec("wadt.nonexistent")`` (the standard
        # optional-dependency probe) would return a truthy spec and defer
        # the ModuleNotFoundError to import time under the wrong name.
        real_name = _REAL + fullname[len("wadt"):]
        if real_name not in sys.modules:
            try:
                if importlib.util.find_spec(real_name) is None:
                    return None
            except ModuleNotFoundError:
                return None
        return importlib.util.spec_from_loader(fullname, self)

    def create_module(self, spec):
        real_name = _REAL + spec.name[len("wadt"):]
        module = importlib.import_module(real_name)
        # importlib is about to stamp alias metadata (__name__/__spec__/
        # __package__/__loader__) onto this — the REAL, shared — module
        # object; save the real values so exec_module can restore them
        # (otherwise relative imports inside the module warn/resolve oddly).
        self._saved[spec.name] = {
            a: getattr(module, a, None)
            for a in ("__name__", "__spec__", "__package__", "__loader__")
        }
        return module

    def exec_module(self, module):  # real module is already executed
        for attr, val in self._saved.pop(module.__spec__.name, {}).items():
            setattr(module, attr, val)


sys.modules[__name__] = _pkg
if not any(isinstance(f, _AliasRedirect) for f in sys.meta_path):
    sys.meta_path.insert(0, _AliasRedirect())
