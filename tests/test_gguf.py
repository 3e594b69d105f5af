"""GGUF weight loading — foldseek's `prostt5-f16.gguf` artifact
(createdb.rs:148-155).  No real GGUF is redistributable offline, so a
synthetic file with the llama.cpp T5-encoder naming and an embedded
tokenizer is round-tripped against the HF-checkpoint loader."""

import re

import numpy as np
import pytest

from unicore_tpu.models.gguf import (
    gguf_to_hf_tensors, read_gguf, vocab_from_gguf, write_gguf,
)
from unicore_tpu.models.tokenizer import PROTT5_AA_ORDER

_INV = {
    "layer.0.layer_norm.weight": "attn_norm.weight",
    "layer.0.SelfAttention.q.weight": "attn_q.weight",
    "layer.0.SelfAttention.k.weight": "attn_k.weight",
    "layer.0.SelfAttention.v.weight": "attn_v.weight",
    "layer.0.SelfAttention.o.weight": "attn_o.weight",
    "layer.0.SelfAttention.relative_attention_bias.weight": "attn_rel_b.weight",
    "layer.1.layer_norm.weight": "ffn_norm.weight",
    "layer.1.DenseReluDense.wi.weight": "ffn_up.weight",
    "layer.1.DenseReluDense.wo.weight": "ffn_down.weight",
}


def _hf_to_gguf_name(k):
    if k in ("shared.weight", "encoder.embed_tokens.weight"):
        return "token_embd.weight"
    if k == "encoder.final_layer_norm.weight":
        return "enc.output_norm.weight"
    m = re.match(r"encoder\.block\.(\d+)\.(.+)", k)
    if m and m.group(2) in _INV:
        return f"enc.blk.{m.group(1)}.{_INV[m.group(2)]}"
    return k  # classifier.* keeps torch names


PREFIX_ID = 131


def _gguf_tokens():
    toks = ["<pad>", "</s>", "<unk>"] + ["▁" + c for c in PROTT5_AA_ORDER]
    while len(toks) < PREFIX_ID:
        toks.append(f"<extra_{len(toks)}>")
    toks += ["<AA2fold>", "<fold2AA>"]
    return toks


def test_gguf_roundtrip_exact(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.randn(6, 10).astype(np.float16).astype(np.float32),
        "b.weight": rng.randn(3, 4, 5).astype(np.float16).astype(np.float32),
    }
    p = str(tmp_path / "x.gguf")
    write_gguf(p, {"general.alignment": 32, "note": "test"}, tensors)
    meta, got = read_gguf(p)
    assert meta["note"] == "test"
    for k, v in tensors.items():
        assert got[k].shape == v.shape
        np.testing.assert_array_equal(got[k], v)


def test_gguf_loads_like_hf_checkpoint(tmp_path):
    """Engine loaded from a gguf-only dir == engine loaded from the same
    (f16-rounded) weights through the HF .bin path, prediction-for-
    prediction."""
    torch = pytest.importorskip("torch")
    from tests.test_prostt5_parity import _small_dims, _write_checkpoint

    import jax.numpy as jnp
    from unicore_tpu.models.prostt5 import ProstT5Engine, T5Config

    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    model, cnn = _write_checkpoint(hf_dir, seed=5)
    # round every tensor to f16 and rewrite BOTH artifacts from it, so
    # the two loaders see bit-identical values
    sd = {k: v.numpy().astype(np.float16).astype(np.float32)
          for k, v in model.state_dict().items()}
    sd.update({k: v.astype(np.float16).astype(np.float32) for k, v in cnn.items()})
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()},
               str(hf_dir / "pytorch_model.bin"))

    gg_dir = tmp_path / "gg"
    gg_dir.mkdir()
    gg_tensors = {}
    for k, v in sd.items():
        gg_tensors.setdefault(_hf_to_gguf_name(k), v)
    write_gguf(str(gg_dir / "prostt5-f16.gguf"),
               {"general.alignment": 32,
                "tokenizer.ggml.tokens": _gguf_tokens()},
               gg_tensors)

    d = _small_dims()
    cfg = T5Config(d_model=d["d_model"], d_kv=d["d_kv"], n_heads=d["n_heads"],
                   d_ff=d["d_ff"], n_layers=d["n_layers"],
                   cnn_hidden=d["cnn_hidden"], ff="relu")
    eng_hf = ProstT5Engine(str(hf_dir), cfg=cfg, dtype=jnp.float32)
    eng_gg = ProstT5Engine(str(gg_dir), cfg=cfg, dtype=jnp.float32)
    assert eng_hf.loaded_pretrained and eng_gg.loaded_pretrained

    seqs = ["MIRGGDIAKGTVLLHKGAPYLVVEREFVNPGKGAAFARVKMK", "ACDEFGHIKLMNPQRSTVWY"]
    assert eng_gg.predict(seqs) == eng_hf.predict(seqs)


def test_vocab_from_gguf_metadata():
    v = vocab_from_gguf({"tokenizer.ggml.tokens": _gguf_tokens()})
    assert v.prefix_id == PREFIX_ID
    assert v.source == "gguf"
    assert v.aa_ids[0] == 3 + PROTT5_AA_ORDER.index("A")


def test_gguf_name_translation():
    tensors = {
        "token_embd.weight": np.zeros((4, 2), np.float32),
        "enc.blk.0.attn_q.weight": np.zeros((2, 2), np.float32),
        "enc.blk.1.ffn_up.weight": np.zeros((3, 2), np.float32),
        "enc.output_norm.weight": np.zeros((2,), np.float32),
        "classifier.0.weight": np.zeros((1, 2, 7, 1), np.float32),
    }
    hf = gguf_to_hf_tensors(tensors)
    assert "shared.weight" in hf
    assert "encoder.block.0.layer.0.SelfAttention.q.weight" in hf
    assert "encoder.block.1.layer.1.DenseReluDense.wi.weight" in hf
    assert "encoder.final_layer_norm.weight" in hf
    assert "classifier.0.weight" in hf


def test_gguf_q8_0_roundtrip(tmp_path):
    """q8_0 write -> read dequantizes within the ggml quantization error
    bound (|err| <= d/2 per element, d = blockwise amax/127)."""
    from unicore_tpu.models.gguf import quantize_q8_0

    rng = np.random.RandomState(1)
    tensors = {
        "a.weight": (rng.randn(8, 64) * 0.3).astype(np.float32),
        "b.weight": np.zeros((2, 32), np.float32),  # all-zero block (d=0)
    }
    p = str(tmp_path / "q.gguf")
    write_gguf(p, {"general.alignment": 32},
               tensors, quant={k: "q8_0" for k in tensors})
    _, got = read_gguf(p)
    for k, v in tensors.items():
        assert got[k].shape == v.shape
        blocks = v.reshape(-1, 32)
        d = (np.abs(blocks).max(axis=1) / 127.0).astype(np.float16).astype(np.float64)
        err = np.abs(got[k].reshape(-1, 32) - blocks)
        assert (err <= np.maximum(d[:, None] * 0.51, 1e-7)).all()
    assert np.array_equal(got["b.weight"], np.zeros((2, 32)))
    # quantize_q8_0 rejects non-multiple-of-32 sizes
    with pytest.raises(ValueError):
        quantize_q8_0(np.zeros(33, np.float32))


def test_gguf_q8_0_loads_through_engine(tmp_path):
    """A q8_0-quantized gguf loads through the same name translation and
    produces predictions close to the f16 artifact (createdb.rs:144-155
    artifact family: foldseek ships quantized ProstT5 variants)."""
    import jax.numpy as jnp

    from unicore_tpu.models.prostt5 import ProstT5Engine, T5Config, init_params

    cfg = T5Config(d_model=64, d_kv=16, n_heads=4, d_ff=128, n_layers=2,
                   cnn_hidden=8, ff="relu")
    params = init_params(cfg, seed=5, dtype=jnp.float32)
    # export through the npz layout for exactness, then re-wrap as gguf
    # with llama.cpp names (same path as test_gguf_loads_like_hf_checkpoint)
    import jax
    flat = {}
    flat["token_embd.weight"] = np.zeros((150, cfg.d_model), np.float32)
    # place internal rows at their vocab ids (see _gguf_tokens layout)
    toks = _gguf_tokens()
    emb = np.asarray(params["embed"], np.float32)
    aa_ids = [toks.index("▁" + c) for c in PROTT5_AA_ORDER]
    from unicore_tpu.models.tokenizer import ProstT5Vocab  # noqa: F401
    from unicore_tpu.alphabets import AA_FULL
    order = {c: i for i, c in enumerate(AA_FULL)}
    for k, aa in enumerate(PROTT5_AA_ORDER):
        if aa in order:
            flat["token_embd.weight"][aa_ids[k]] = emb[order[aa]]
    flat["token_embd.weight"][toks.index("<AA2fold>")] = emb[21]
    flat["token_embd.weight"][toks.index("</s>")] = emb[22]
    flat["token_embd.weight"][toks.index("<pad>")] = emb[23]
    flat["enc.output_norm.weight"] = np.asarray(params["final_ln"], np.float32)
    for i, layer in enumerate(params["layers"]):
        pre = f"enc.blk.{i}."
        flat[pre + "attn_norm.weight"] = np.asarray(layer["ln1"], np.float32)
        for nm, key in (("attn_q", "q"), ("attn_k", "k"), ("attn_v", "v"), ("attn_o", "o")):
            flat[pre + nm + ".weight"] = np.asarray(layer[key], np.float32).T
        flat[pre + "ffn_norm.weight"] = np.asarray(layer["ln2"], np.float32)
        flat[pre + "ffn_up.weight"] = np.asarray(layer["wi"], np.float32).T
        flat[pre + "ffn_down.weight"] = np.asarray(layer["wo"], np.float32).T
    flat["enc.blk.0.attn_rel_b.weight"] = np.asarray(params["rel_bias"], np.float32)
    cnn = params["cnn"]
    flat["classifier.0.weight"] = np.transpose(np.asarray(cnn["w1"], np.float32), (2, 1, 0))[..., None]
    flat["classifier.0.bias"] = np.asarray(cnn["b1"], np.float32)
    flat["classifier.3.weight"] = np.transpose(np.asarray(cnn["w2"], np.float32), (2, 1, 0))[..., None]
    flat["classifier.3.bias"] = np.asarray(cnn["b2"], np.float32)

    meta = {"general.alignment": 32, "tokenizer.ggml.tokens": _gguf_tokens()}
    d16 = tmp_path / "f16"; d16.mkdir()
    dq8 = tmp_path / "q8"; dq8.mkdir()
    write_gguf(str(d16 / "m.gguf"), meta, flat)
    quant = {k: "q8_0" for k, v in flat.items()
             if v.ndim == 2 and v.size % 32 == 0 and "norm" not in k}
    write_gguf(str(dq8 / "m.gguf"), meta, flat, quant=quant)

    e16 = ProstT5Engine(str(d16), cfg=cfg, dtype=jnp.float32)
    eq8 = ProstT5Engine(str(dq8), cfg=cfg, dtype=jnp.float32)
    assert e16.loaded_pretrained and eq8.loaded_pretrained
    seqs = ["MIRGGDIAKGTVLLHKGAPYLVVEREF", "ACDEFGHIKLMNPQRSTVWY"]
    p16 = e16.predict(seqs)
    pq8 = eq8.predict(seqs)
    agree = np.mean([a == b for s16, s8 in zip(p16, pq8) for a, b in zip(s16, s8)])
    assert agree > 0.9, f"q8_0 predictions diverged: {agree:.2f} agreement"
