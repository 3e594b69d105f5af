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
