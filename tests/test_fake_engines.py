"""Engine-swap test: the orchestration layer runs against fake engines
registered in the registry (the analog of pointing path.cfg at a stub
binary) — SURVEY §4's 'fake engine registry' requirement."""

import os

from unicore_tpu.runtime import registry


class FakeTreeEngine:
    name = "fake-tree"
    calls = []

    def run_file(self, msa_fasta, output_dir, options="", threads=0):
        FakeTreeEngine.calls.append((msa_fasta, options))
        out = os.path.join(output_dir, "iqtree.treefile")
        names = [
            l[1:].strip() for l in open(msa_fasta) if l.startswith(">")
        ]
        with open(out, "w") as f:
            f.write("(" + ",".join(f"{n}:0.1" for n in names) + ");\n")
        return out

    def probe(self):
        return True


def test_engines_cfg_override_changes_tree_engine(tmp_path, monkeypatch):
    """engines.cfg must govern execution: `config --set-iqtree` writes an
    override and the tree module then runs THAT engine (the analog of
    path.cfg governing which binary runs, variables.rs:118-132)."""
    import subprocess
    import sys

    from unicore_tpu.modules.tree import run_tree_builder

    pkg = tmp_path / "fake_engines_mod.py"
    pkg.write_text(
        "import os\n"
        "class CfgFakeTree:\n"
        "    def __init__(self, *a, **k): pass\n"
        "    def run_file(self, msa, outdir, options='', threads=0):\n"
        "        out = os.path.join(outdir, 'iqtree.treefile')\n"
        "        open(out, 'w').write('(cfg_fake:1.0);\\n')\n"
        "        return out\n"
        "    def probe(self): return True\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.chdir(tmp_path)

    # `config --set-iqtree` writes engines.cfg in the discoverable location
    from unicore_tpu.modules.config import set_engine
    monkeypatch.setenv("UNICORE_TPU_ENGINES_CFG", str(tmp_path / "engines.cfg"))
    set_engine("iqtree", "fake_engines_mod:CfgFakeTree")

    registry.clear_overrides()
    registry.load_overrides(str(tmp_path / "engines.cfg"))
    try:
        msa = tmp_path / "combined.fasta"
        msa.write_text(">sp1\nACDE\n>sp2\nACDF\n>sp3\nACDE\n")
        out = run_tree_builder("iqtree", str(tmp_path), str(msa), None)
        assert open(out).read().startswith("(cfg_fake")
        # value "builtin" and a broken override both resolve sanely
        registry.clear_overrides()
        registry.load_overrides(str(tmp_path / "engines.cfg"))
        registry._OVERRIDES["iqtree"] = "no_such_module:Nope"
        import pytest
        from unicore_tpu.runtime import errors as err
        with pytest.raises(err.UnicoreError) as ei:
            registry.get("iqtree")
        assert ei.value.err_code == err.ERR_BINARY_NOT_FOUND
    finally:
        registry.clear_overrides()


def test_tree_module_with_fake_builder(tmp_path, monkeypatch):
    from unicore_tpu.modules.tree import run_tree_builder

    monkeypatch.setitem(registry._FACTORIES, "iqtree", FakeTreeEngine)
    msa = tmp_path / "combined.fasta"
    msa.write_text(">sp1\nACDE\n>sp2\nACDF\n>sp3\nACDE\n")
    FakeTreeEngine.calls.clear()
    out = run_tree_builder("iqtree", str(tmp_path), str(msa), None)
    assert FakeTreeEngine.calls, "fake engine was not invoked"
    # default options flow through (tree.rs:143 default)
    assert FakeTreeEngine.calls[0][1] == "-m JTT+F+I+G -B 1000"
    assert open(out).read().startswith("(sp1:0.1,sp2:0.1,sp3:0.1)")
