"""config — engine availability checks and overrides.

The reference validates external binary paths (modules/config.rs:11-79);
here engines are in-process, so `--check` probes each engine end-to-end
on tiny inputs and reports device/backend status, and `--set-X` records
an override in engines.cfg (value "builtin" resets to the default; any
other value is an importable "module:attr" factory path).
"""

from __future__ import annotations

import os

from unicore_tpu.runtime import errors as err
from unicore_tpu.runtime import logging as msg
from unicore_tpu.runtime import registry

_CHECKABLE = (
    "foldseek", "foldmason", "mafft", "mafft-linsi",
    "iqtree", "fasttree", "raxml-ng", "mmseqs",
)


def task_check() -> None:
    import jax

    devices = jax.devices()
    msg.println_message("Device status:", 3)
    msg.println_message(f"  backend: {devices[0].platform}, devices: {len(devices)}", 3)
    for d in devices:
        msg.println_message(f"    {d}", 4)
    msg.println_message("Engine status:", 3)
    for name in _CHECKABLE:
        factory = registry.get(name)
        if factory is None:
            msg.println_message(f"  {name}: no", 3)
            continue
        if name == "mmseqs":
            msg.println_message(f"  {name}: n/a (never invoked; parity slot)", 3)
            continue
        try:
            engine = factory()
            ok = engine.probe() if hasattr(engine, "probe") else True
            msg.println_message(f"  {name}: {'ok' if ok else 'no'} ({getattr(engine, 'name', '?')})", 3)
        except Exception as e:  # noqa: BLE001 - report, don't crash the check
            msg.println_message(f"  {name}: no ({e})", 3)


def set_engine(name: str, value: str) -> None:
    cfg = registry.locate_engines_cfg()
    if cfg is None:
        cfg = os.path.expanduser("~/.unicore_tpu/engines.cfg")
        os.makedirs(os.path.dirname(cfg), exist_ok=True)
    entries = {}
    if os.path.isfile(cfg):
        with open(cfg) as f:
            for line in f:
                line = line.strip()
                if line and not line.startswith("#") and "=" in line:
                    k, v = line.split("=", 1)
                    entries[k.strip()] = v.strip()
    if value != "builtin":
        mod_path = value.split(":")[0]
        try:
            __import__(mod_path)
        except ImportError:
            err.error(err.ERR_GENERAL, f"Cannot import engine override module: {mod_path}")
        entries[name] = value
    else:
        entries.pop(name, None)
    with open(cfg, "w") as f:
        f.write("# unicore-tpu engine overrides (name=module:attr or omit for builtin)\n")
        for k in _CHECKABLE:
            if k in entries:
                f.write(f"{k}={entries[k]}\n")
            else:
                f.write(f"# {k}=builtin\n")
    msg.println_message(f"Engine '{name}' set to {value} in {cfg}", 3)


def run(args) -> None:
    if getattr(args, "config_check", False):
        task_check()
        return
    did = False
    for name in _CHECKABLE:
        attr = "config_set_" + name.replace("-", "_")
        val = getattr(args, attr, None)
        if val:
            set_engine(name, val)
            did = True
    if not did:
        msg.println_message("Nothing to do (use --check or --set-<engine>)", 2)
