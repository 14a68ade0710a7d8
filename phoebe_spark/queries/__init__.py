"""Oracle-checked query registry (package facade).

The registry was a single 26k-line module through round 8; it is now one
module per 50-query block plus ``_core`` (registry dicts, the ``query``
decorator, shared policy helpers). Importing this package imports every
block, so ``QUERIES`` / ``ORACLE`` are fully populated, and every top-level
name of every block is re-exported here so existing importers
(``from phoebe_spark.queries import X``) are unaffected by the split.
"""

from __future__ import annotations

from . import _core
MODS = ['q001_050', 'q051_100', 'q101_150', 'q151_200', 'q201_250', 'q251_300', 'q301_350', 'q351_400', 'q401_450', 'q451_500', 'q501_550']

import importlib as _importlib

_mods = [_core] + [_importlib.import_module(f".{m}", __name__) for m in MODS]
for _m in _mods:
    for _k, _v in vars(_m).items():
        if not _k.startswith("__"):
            globals().setdefault(_k, _v)
del _m, _k, _v, _mods, _importlib
