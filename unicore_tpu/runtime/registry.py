"""Engine registry — the in-process analog of the reference's BinaryPaths.

The reference resolves 8 external binary names through `path.cfg`
(envs/variables.rs:79-144). Here every capability is an in-process engine;
the registry maps the same names to engine factories so that

  * the `config` module can report/probe them (`--check`),
  * tests can swap in fakes without touching the pipeline code,
  * user overrides in `engines.cfg` (same `name=value` format as path.cfg,
    `#` comments) can select alternative backends.

Valid names mirror envs/variables.rs:79-81 plus TPU-native extras.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

from . import errors as err

# Names kept for parity with the reference's VALID_BINARY set.
VALID_ENGINES = (
    "foldseek",      # -> unicore_tpu.align (pairwise/cluster/search engine)
    "foldmason",     # -> unicore_tpu.msa 3Di-aware progressive MSA
    "mafft",         # -> unicore_tpu.msa AA-only progressive MSA
    "mafft-linsi",   # -> unicore_tpu.msa AA-only, accurate settings
    "iqtree",        # -> unicore_tpu.phylo ML engine (NNI + UFBoot-style)
    "fasttree",      # -> unicore_tpu.phylo approximate-ML schedule
    "raxml-ng",      # -> unicore_tpu.phylo ML engine (raxml-style schedule)
    "mmseqs",        # registered but never invoked (parity: variables.rs:80)
    "prostt5",       # TPU-native extra: the AA->3Di translation model
)

_FACTORIES: Dict[str, Callable[[], object]] = {}
_OVERRIDES: Dict[str, str] = {}


def register(name: str, factory: Callable[[], object]) -> None:
    if name not in VALID_ENGINES:
        err.error(err.ERR_GENERAL, f"Unknown engine name: {name}")
    _FACTORIES[name] = factory


def _resolve_override(name: str, spec: str) -> Callable[..., object]:
    """Import a "module:attr" engine factory named in engines.cfg.

    The analog of the reference resolving path.cfg entries to real
    binaries (variables.rs:118-132); a broken entry maps to the same
    typed failure as a missing binary (error_handler.rs BINARY_NOT_FOUND).
    """
    import importlib

    mod_name, _, attr = spec.partition(":")
    try:
        mod = importlib.import_module(mod_name)
        return getattr(mod, attr) if attr else mod  # type: ignore[return-value]
    except (ImportError, AttributeError) as e:
        err.error(
            err.ERR_BINARY_NOT_FOUND,
            f"engine override '{name}={spec}' does not resolve: {e}",
        )
        raise  # unreachable; err.error raises


def get(name: str) -> Optional[Callable[..., object]]:
    """Resolve an engine factory: engines.cfg override first, then the
    built-in default (the override value "builtin" forces the default)."""
    ov = _OVERRIDES.get(name)
    if ov and ov != "builtin":
        return _resolve_override(name, ov)
    return _FACTORIES.get(name)


def has(name: str) -> bool:
    return name in _FACTORIES


def locate_engines_cfg() -> Optional[str]:
    """Config location probe mirroring variables.rs:66-76.

    `UNICORE_TPU_ENGINES_CFG` pins the location outright (even if the
    file does not exist yet — `config --set-*` will create it there);
    otherwise the usual 3-location existence probe applies."""
    env = os.environ.get("UNICORE_TPU_ENGINES_CFG")
    if env:
        return env
    candidates = [
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "etc", "engines.cfg"),
        os.path.join(os.getcwd(), "engines.cfg"),
        os.path.expanduser("~/.unicore_tpu/engines.cfg"),
    ]
    for c in candidates:
        if os.path.isfile(c):
            return os.path.abspath(c)
    return None


def load_overrides(path: Optional[str] = None) -> Dict[str, str]:
    path = path or locate_engines_cfg()
    if path is None or not os.path.isfile(path):
        return {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, v = line.split("=", 1)
            _OVERRIDES[k.strip()] = v.strip()
    return dict(_OVERRIDES)


def get_override(name: str) -> Optional[str]:
    return _OVERRIDES.get(name)


def clear_overrides() -> None:
    """Reset override state (test isolation)."""
    _OVERRIDES.clear()


def _register_defaults() -> None:
    """Lazy default wiring; engines import jax only when instantiated."""

    def _align_engine(params=None):
        from unicore_tpu.align.engine import AlignmentEngine
        return AlignmentEngine(params)

    def _msa_engine_foldmason():
        from unicore_tpu.msa.progressive import ProgressiveMSA
        return ProgressiveMSA(mode="3di+aa")

    def _msa_engine_mafft():
        from unicore_tpu.msa.progressive import ProgressiveMSA
        return ProgressiveMSA(mode="aa")

    def _msa_engine_linsi():
        from unicore_tpu.msa.progressive import ProgressiveMSA
        return ProgressiveMSA(mode="aa", refine_iters=2)

    def _tree_iqtree():
        from unicore_tpu.phylo.engine import TreeEngine
        return TreeEngine(schedule="iqtree")

    def _tree_fasttree():
        from unicore_tpu.phylo.engine import TreeEngine
        return TreeEngine(schedule="fasttree")

    def _tree_raxml():
        from unicore_tpu.phylo.engine import TreeEngine
        return TreeEngine(schedule="raxml-ng")

    def _prostt5(model_dir=None):
        from unicore_tpu.models.prostt5 import ProstT5Engine
        return ProstT5Engine(model_dir)

    defaults = {
        "foldseek": _align_engine,
        "foldmason": _msa_engine_foldmason,
        "mafft": _msa_engine_mafft,
        "mafft-linsi": _msa_engine_linsi,
        "iqtree": _tree_iqtree,
        "fasttree": _tree_fasttree,
        "raxml-ng": _tree_raxml,
        "prostt5": _prostt5,
    }
    for k, v in defaults.items():
        _FACTORIES.setdefault(k, v)


_register_defaults()
