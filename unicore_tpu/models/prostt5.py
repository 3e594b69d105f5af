"""ProstT5 AA->3Di translation as a JAX T5 encoder + CNN head.

Replaces `foldseek createdb --prostt5-model` (createdb.rs:158-166): every
amino-acid sequence is translated to an equal-length 3Di string.  The
network is the ProstT5 architecture — a ProtT5-XL encoder, which is the
*original* T5 (v1.0) encoder stack: 24 layers, d_model 1024, 32 heads
with d_kv 128, d_ff 16384 with a single-`wi` **relu** FFN, T5
relative-position buckets, RMSNorm — followed by the 2-layer
residue-wise CNN head (1024 -> 32 -> 20, kernel 7, same zero padding)
that predicts 3Di states in alphabetical class order
``ACDEFGHIKLMNPQRSTVWY`` (ProstT5's published ss_mapping, which equals
``alphabets.TDI_ALPHABET``).

Inference contract (matches ProstT5's encoder-only predictor and the
foldseek GPU path): the encoder input is
``[<AA2fold>, residue tokens..., </s>]``; the CNN head sees only the
residue hidden states (positions outside the residues are zeroed, which
reproduces the reference's per-sequence slice + zero-padded conv).

TPU-first design decisions:
  * bfloat16 activations/weights, float32 logits
  * length-bucketed batches, padded to (8, 128) friendly shapes
  * data parallel over the batch axis and tensor parallel over heads /
    d_ff via jax.sharding (see unicore_tpu.parallel) — one jit, XLA
    inserts the collectives
  * weights load from a HuggingFace ProstT5 checkpoint directory
    (safetensors / pytorch_model.bin via torch-cpu) or an .npz export;
    token embeddings are gathered from ``shared.weight`` through the
    checkpoint's sentencepiece vocabulary (models/tokenizer.py), never
    positionally.  Without weights (offline) a seeded deterministic
    initialization is used so the full pipeline remains runnable (and
    the `mock` backend stays the recommended offline test path).
"""

from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unicore_tpu.alphabets import TDI_ALPHABET, encode_aa
from unicore_tpu.models.tokenizer import ProstT5Vocab, load_vocab
from unicore_tpu.runtime import errors as err
from unicore_tpu.runtime import logging as msg

# Internal token codes.  0..20 are the AA codes from alphabets.py; the
# specials sit above them so kernel-side "is residue" is `tok < TOK_PREFIX`.
TOK_PREFIX = 21   # <AA2fold> direction token
TOK_EOS = 22      # </s>
TOK_PAD = 23      # <pad>


@dataclass(frozen=True)
class T5Config:
    vocab: int = 25           # 20 AA + X + prefix/eos/pad + spare
    d_model: int = 1024
    d_kv: int = 128
    n_heads: int = 32
    d_ff: int = 16384
    n_layers: int = 24
    rel_buckets: int = 32
    rel_max_dist: int = 128
    n_classes: int = 20       # 3Di states
    cnn_hidden: int = 32
    cnn_kernel: int = 7
    ff: str = "relu"          # ProtT5/ProstT5 = original T5: single-wi relu
                              # ("gated-gelu" supported for v1.1-style ckpts)

    @classmethod
    def small(cls) -> "T5Config":
        """Reduced config for compile checks / tests."""
        return cls(d_model=256, d_kv=32, n_heads=8, d_ff=1024, n_layers=4)


# ---------------------------------------------------------------------------
# parameter init / loading
# ---------------------------------------------------------------------------

def init_params(cfg: T5Config, seed: int = 0, dtype=jnp.bfloat16) -> Dict:
    rng = np.random.RandomState(seed)

    def mat(*shape, scale=None):
        scale = scale or (1.0 / math.sqrt(shape[0]))
        return (rng.randn(*shape) * scale).astype(np.float32)

    params: Dict = {
        "embed": mat(cfg.vocab, cfg.d_model, scale=1.0),
        "rel_bias": mat(cfg.rel_buckets, cfg.n_heads, scale=0.1),
        "final_ln": np.ones(cfg.d_model, np.float32),
        "layers": [],
        "cnn": {
            "w1": mat(cfg.cnn_kernel, cfg.d_model, cfg.cnn_hidden),
            "b1": np.zeros(cfg.cnn_hidden, np.float32),
            "w2": mat(cfg.cnn_kernel, cfg.cnn_hidden, cfg.n_classes),
            "b2": np.zeros(cfg.n_classes, np.float32),
        },
    }
    inner = cfg.n_heads * cfg.d_kv
    for _ in range(cfg.n_layers):
        layer = {
            "ln1": np.ones(cfg.d_model, np.float32),
            "q": mat(cfg.d_model, inner),
            "k": mat(cfg.d_model, inner),
            "v": mat(cfg.d_model, inner),
            "o": mat(inner, cfg.d_model),
            "ln2": np.ones(cfg.d_model, np.float32),
            "wo": mat(cfg.d_ff, cfg.d_model),
        }
        if cfg.ff == "gated-gelu":
            layer["wi0"] = mat(cfg.d_model, cfg.d_ff)  # gate
            layer["wi1"] = mat(cfg.d_model, cfg.d_ff)  # linear
        else:
            layer["wi"] = mat(cfg.d_model, cfg.d_ff)   # original T5 relu
        params["layers"].append(layer)
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), params)


def infer_config(model_dir: Optional[str]) -> Optional[T5Config]:
    """Geometry from the checkpoint's HF config.json (shipped by every
    HF T5 checkpoint; absent from gguf dirs, which are fixed-geometry
    ProstT5-XL).  Lets one engine load any T5 geometry — including the
    synthetic reduced checkpoints the weights-arrival drill fabricates
    (scripts/weights_drill.py)."""
    if not model_dir or not os.path.isdir(model_dir):
        return None
    cj = os.path.join(model_dir, "config.json")
    if not os.path.isfile(cj):
        return None
    try:
        import json
        with open(cj) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    if "d_model" not in d:
        return None
    proj = d.get("feed_forward_proj", "relu")
    gated = bool(d.get("is_gated_act")) or str(proj).startswith("gated")
    return T5Config(
        d_model=int(d.get("d_model", 1024)),
        d_kv=int(d.get("d_kv", 128)),
        n_heads=int(d.get("num_heads", 32)),
        d_ff=int(d.get("d_ff", 16384)),
        n_layers=int(d.get("num_layers", 24)),
        rel_buckets=int(d.get("relative_attention_num_buckets", 32)),
        rel_max_dist=int(d.get("relative_attention_max_distance", 128)),
        ff="gated-gelu" if gated else "relu",
    )


def load_params(model_dir: str, cfg: T5Config, dtype=jnp.bfloat16) -> Dict:
    """Load from an HF ProstT5 checkpoint dir or our own .npz export.

    Embedding rows are gathered from ``shared.weight`` through the
    checkpoint's sentencepiece vocabulary: internal AA codes 0..20 map to
    their real token ids (ids 3.. in ProtT5 frequency order, NOT a
    positional slice), TOK_PREFIX/TOK_EOS/TOK_PAD map to
    ``<AA2fold>``/``</s>``/``<pad>``.
    """
    npz = os.path.join(model_dir, "prostt5_tpu.npz")
    if os.path.isfile(npz):
        raw = np.load(npz)
        params = init_params(cfg, dtype=dtype)
        flat = {k: jnp.asarray(v, dtype) for k, v in raw.items()}
        return _unflatten_into(params, flat)

    tensors = _load_hf_tensors(model_dir)
    if tensors is None:
        return None

    def t(name):
        v = tensors.get(name)
        return None if v is None else np.asarray(v, np.float32)

    vocab = load_vocab(model_dir)
    shared = t("shared.weight")
    if shared is None:
        shared = t("encoder.embed_tokens.weight")
    row_ids = np.full(cfg.vocab, vocab.unk_id, dtype=np.int64)
    row_ids[: len(vocab.aa_ids)] = vocab.aa_ids
    row_ids[TOK_PREFIX] = vocab.prefix_id
    row_ids[TOK_EOS] = vocab.eos_id
    row_ids[TOK_PAD] = vocab.pad_id
    if row_ids.max() >= shared.shape[0]:
        msg.println_message(
            f"Warning: vocab id {int(row_ids.max())} out of range for "
            f"shared.weight rows {shared.shape[0]}; clamping (the affected "
            "token embeddings will be wrong — check the tokenizer files).", 1,
        )
        row_ids = np.minimum(row_ids, shared.shape[0] - 1)

    # FFN flavor from the checkpoint names (original T5 = single wi+relu);
    # encoder_forward branches on the param keys, so a v1.1-style gated
    # checkpoint works even if cfg.ff says "relu".
    gated_ckpt = "encoder.block.0.layer.1.DenseReluDense.wi_0.weight" in tensors

    p: Dict = {}
    p["embed"] = shared[row_ids]
    p["rel_bias"] = t(
        "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
    )
    p["final_ln"] = t("encoder.final_layer_norm.weight")
    p["layers"] = []
    for i in range(cfg.n_layers):
        pre = f"encoder.block.{i}.layer"
        layer = {
            "ln1": t(f"{pre}.0.layer_norm.weight"),
            "q": t(f"{pre}.0.SelfAttention.q.weight").T,
            "k": t(f"{pre}.0.SelfAttention.k.weight").T,
            "v": t(f"{pre}.0.SelfAttention.v.weight").T,
            "o": t(f"{pre}.0.SelfAttention.o.weight").T,
            "ln2": t(f"{pre}.1.layer_norm.weight"),
            "wo": t(f"{pre}.1.DenseReluDense.wo.weight").T,
        }
        if gated_ckpt:
            layer["wi0"] = t(f"{pre}.1.DenseReluDense.wi_0.weight").T
            layer["wi1"] = t(f"{pre}.1.DenseReluDense.wi_1.weight").T
        else:
            layer["wi"] = t(f"{pre}.1.DenseReluDense.wi.weight").T
        p["layers"].append(layer)
    # CNN head (foldseek's prostt5 CNN checkpoint layout)
    cnn_w1 = t("classifier.0.weight")  # (32, 1024, 7, 1) torch conv2d
    if cnn_w1 is not None:
        p["cnn"] = {
            "w1": np.transpose(cnn_w1[..., 0], (2, 1, 0)),  # (7, 1024, 32)
            "b1": t("classifier.0.bias"),
            "w2": np.transpose(t("classifier.3.weight")[..., 0], (2, 1, 0)),
            "b2": t("classifier.3.bias"),
        }
    else:
        p["cnn"] = jax.tree_util.tree_map(
            np.asarray, init_params(T5Config(), 0, jnp.float32)["cnn"]
        )
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype), p)


def _load_hf_tensors(model_dir: str) -> Optional[Dict[str, np.ndarray]]:
    st_files = [f for f in os.listdir(model_dir) if f.endswith(".safetensors")] if os.path.isdir(model_dir) else []
    if st_files:
        from safetensors.numpy import load_file
        out = {}
        for f in sorted(st_files):
            out.update(load_file(os.path.join(model_dir, f)))
        return out
    bin_path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.isfile(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    # foldseek's weight artifact (createdb.rs:148: prostt5-f16.gguf)
    from unicore_tpu.models.gguf import find_gguf, gguf_to_hf_tensors, read_gguf
    gg = find_gguf(model_dir)
    if gg is not None:
        _, tensors = read_gguf(gg)
        return gguf_to_hf_tensors(tensors)
    return None


def _unflatten_into(template: Dict, flat: Dict) -> Dict:
    out = jax.tree_util.tree_map(lambda x: x, template)
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node[int(p) if p.isdigit() else p]
        node[parts[-1] if not parts[-1].isdigit() else int(parts[-1])] = v
    return out


# ---------------------------------------------------------------------------
# forward pass
# ---------------------------------------------------------------------------

def _rmsnorm(x, w, eps=1e-6):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _rel_bucket(rel_pos, n_buckets=32, max_dist=128):
    """T5 bidirectional relative position bucketing (bit-exact vs HF)."""
    num = n_buckets // 2
    ret = jnp.where(rel_pos > 0, num, 0)
    n = jnp.abs(rel_pos)
    max_exact = num // 2
    is_small = n < max_exact
    # max(n, max_exact) keeps log() >= 0 where the large branch is unused,
    # so the truncation toward zero matches HF's .long() exactly.
    val_large = max_exact + (
        jnp.log(jnp.maximum(n, max_exact).astype(jnp.float32) / max_exact)
        / math.log(max_dist / max_exact)
        * (num - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num - 1)
    return ret + jnp.where(is_small, n, val_large)


def encoder_forward(params: Dict, cfg: T5Config, tokens: jnp.ndarray, mask: jnp.ndarray):
    """tokens (B, L) int32; mask (B, L) bool. Returns (B, L, d_model)."""
    B, L = tokens.shape
    x = params["embed"][tokens]  # (B, L, D)

    pos = jnp.arange(L)
    rel = pos[None, :] - pos[:, None]  # (L, L) memory positions - query
    buckets = _rel_bucket(rel, cfg.rel_buckets, cfg.rel_max_dist)
    bias = params["rel_bias"][buckets]  # (L, L, H)
    bias = jnp.transpose(bias, (2, 0, 1))[None]  # (1, H, L, L)
    neg = jnp.asarray(-1e9, jnp.float32)
    attn_mask = jnp.where(mask[:, None, None, :], 0.0, neg)  # (B, 1, 1, L)

    for lp in params["layers"]:
        # self-attention
        h = _rmsnorm(x, lp["ln1"])
        q = h @ lp["q"]
        k = h @ lp["k"]
        v = h @ lp["v"]
        q = q.reshape(B, L, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        k = k.reshape(B, L, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        v = v.reshape(B, L, cfg.n_heads, cfg.d_kv).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores + bias.astype(jnp.float32) + attn_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, L, -1)
        x = x + ctx @ lp["o"]

        # FFN: ProtT5/ProstT5 = original T5 single-wi relu; gated-gelu
        # (v1.1-style checkpoints) selected by param key at trace time.
        h = _rmsnorm(x, lp["ln2"])
        if "wi" in lp:
            x = x + jax.nn.relu(h @ lp["wi"]) @ lp["wo"]
        else:
            g = jax.nn.gelu(h @ lp["wi0"], approximate=True)
            x = x + (g * (h @ lp["wi1"])) @ lp["wo"]

    return _rmsnorm(x, params["final_ln"])


def cnn_head(params: Dict, cfg: T5Config, x: jnp.ndarray, res_mask=None) -> jnp.ndarray:
    """Residue-wise conv head: (B, L, D) -> (B, L, n_classes) logits.

    With `res_mask` (B, L) the head reproduces the reference's
    per-sequence "slice residues, then conv with zero padding" semantics
    inside a padded batch: both the input and the inter-conv activation
    are zeroed outside the residue span, so every conv window sees
    exactly what it would see on the isolated sliced sequence.
    """
    c = params["cnn"]
    x = x.astype(jnp.float32)
    if res_mask is not None:
        x = x * res_mask[..., None].astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        x,
        c["w1"].astype(jnp.float32),  # (K, D, H)
        window_strides=(1,),
        padding=[(cfg.cnn_kernel // 2, cfg.cnn_kernel // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + c["b1"].astype(jnp.float32)
    y = jax.nn.relu(y)
    if res_mask is not None:
        y = y * res_mask[..., None].astype(jnp.float32)
    y = jax.lax.conv_general_dilated(
        y,
        c["w2"].astype(jnp.float32),
        window_strides=(1,),
        padding=[(cfg.cnn_kernel // 2, cfg.cnn_kernel // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + c["b2"].astype(jnp.float32)
    return y


def residue_logits(params: Dict, cfg: T5Config, tokens: jnp.ndarray, mask: jnp.ndarray):
    """Encoder + CNN with the ProstT5 residue-slice semantics.

    Hidden states at non-residue positions (the <AA2fold> prefix, </s>,
    padding) are zeroed before the CNN so its zero-padded conv windows see
    exactly what the reference's per-sequence slice sees; 3Di predictions
    are therefore read at the same positions as the residue tokens.
    """
    h = encoder_forward(params, cfg, tokens, mask)
    is_res = (tokens < TOK_PREFIX) & mask
    return cnn_head(params, cfg, h, res_mask=is_res)


@functools.partial(jax.jit, static_argnames=("cfg",))
def predict_3di_codes(params: Dict, cfg: T5Config, tokens: jnp.ndarray, mask: jnp.ndarray):
    return jnp.argmax(residue_logits(params, cfg, tokens, mask), axis=-1)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

def _bucket_len(n: int) -> int:
    b = 128
    while b < n:
        b += 128
    return b


class ProstT5Engine:
    """Batched AA->3Di inference engine."""

    name = "prostt5-jax"

    def __init__(
        self,
        model_dir: Optional[str] = None,
        cfg: Optional[T5Config] = None,
        batch_tokens: int = 64 * 512,
        seed: int = 0,
        dtype=jnp.bfloat16,
        max_window: int = 2048,
        overlap: int = 256,
    ):
        # very long proteins are translated in overlapping windows and
        # stitched at overlap midpoints (attention memory is O(L^2); the
        # reference handles long inputs by EXCLUDING them via --max-len,
        # createdb.rs:93-95 — windowing keeps them)
        self.max_window = max_window
        self.overlap = overlap
        self.cfg = cfg or infer_config(model_dir) or T5Config()
        self.params = None
        self.loaded_pretrained = False
        if model_dir and os.path.isdir(model_dir):
            p = load_params(model_dir, self.cfg, dtype=dtype)
            if p is not None:
                self.params = p
                self.loaded_pretrained = True
        if self.params is None:
            if model_dir and model_dir not in ("random", "mock"):
                msg.println_message(
                    f"Warning: no loadable ProstT5 weights under '{model_dir}'; "
                    "using seeded random initialization (offline build). "
                    "Predictions are deterministic but not ProstT5-accurate; "
                    "use model='mock' for the supported offline backend.", 2,
                )
            self.params = init_params(self.cfg, seed=seed)
        self.batch_tokens = batch_tokens

    def _dp_setup(self):
        """Data-parallel inference over all local devices (lazy)."""
        if getattr(self, "_dp", None) is not None:
            return self._dp
        import jax

        n = len(jax.devices())
        if n <= 1:
            self._dp = (1, None)
            return self._dp
        from unicore_tpu.parallel.mesh import make_mesh
        from unicore_tpu.parallel.sharding import make_sharded_predict

        mesh = make_mesh(dp=n, tp=1)
        self._dp = (n, make_sharded_predict(self.cfg, mesh))
        return self._dp

    def predict(self, sequences: List[str]) -> List[str]:
        """AA->3Di with overlap-window stitching for very long inputs.

        Sequences up to `max_window` go through one framed forward pass;
        longer ones are split into `max_window`-wide windows overlapping
        by `overlap`, each translated independently, and the 3Di string
        is stitched with ownership switching at overlap midpoints
        (deterministic; windows see `overlap/2` residues of flanking
        context at every owned position)."""
        W, V = self.max_window, self.overlap
        pieces: List[tuple] = []  # (orig_idx, start, aa_piece)
        for idx, s in enumerate(sequences):
            if len(s) <= W:
                pieces.append((idx, 0, s))
                continue
            step = W - V
            starts = list(range(0, max(len(s) - W, 0) + 1, step))
            if starts[-1] + W < len(s):
                starts.append(len(s) - W)
            for st in starts:
                pieces.append((idx, st, s[st : st + W]))
        piece_3di = self._predict_units([p[2] for p in pieces])

        out: List[Optional[str]] = [None] * len(sequences)
        chars: Dict[int, list] = {}
        bounds: Dict[int, int] = {}  # orig_idx -> end of previously owned region
        for (idx, st, aa_piece), di in zip(pieces, piece_3di):
            if len(sequences[idx]) <= W:
                out[idx] = di
                continue
            buf = chars.setdefault(idx, ["X"] * len(sequences[idx]))
            own_from = bounds.get(idx, 0)          # midpoint handoff
            own_to = st + len(aa_piece)
            for pos in range(max(own_from, st), own_to):
                buf[pos] = di[pos - st]
            bounds[idx] = st + len(aa_piece) - V // 2
        for idx, buf in chars.items():
            out[idx] = "".join(buf)
        return out  # type: ignore[return-value]

    def _predict_units(self, sequences: List[str]) -> List[str]:
        """Single-window batched forward (each unit framed
        ``[<AA2fold>, residues..., </s>]``, ProstT5's AA->fold direction);
        3Di letters are read back at the residue positions."""
        tdi = np.frombuffer(TDI_ALPHABET.encode(), dtype=np.uint8)
        out: List[Optional[str]] = [None] * len(sequences)
        n_dev, sharded_predict = self._dp_setup()
        order = sorted(range(len(sequences)), key=lambda i: len(sequences[i]))
        i = 0
        while i < len(order):
            # bucket on the framed length (prefix + residues + eos)
            L = _bucket_len(len(sequences[order[i]]) + 2)
            bs = max(8, min(512, self.batch_tokens // L))
            chunk = order[i : i + bs]
            # keep the chunk within this length bucket
            chunk = [j for j in chunk if len(sequences[j]) + 2 <= L]
            i += len(chunk)
            B = len(chunk)
            pad = 8 * max(1, n_dev)
            Bp = ((B + pad - 1) // pad) * pad
            toks = np.full((Bp, L), TOK_PAD, dtype=np.int32)
            mask = np.zeros((Bp, L), dtype=bool)
            for r, j in enumerate(chunk):
                codes = encode_aa(sequences[j])
                n = len(codes)
                toks[r, 0] = TOK_PREFIX
                toks[r, 1 : n + 1] = codes
                toks[r, n + 1] = TOK_EOS
                mask[r, : n + 2] = True
            if sharded_predict is not None:
                codes3 = np.asarray(
                    sharded_predict(self.params, jnp.asarray(toks), jnp.asarray(mask))
                )
            else:
                codes3 = np.asarray(
                    predict_3di_codes(self.params, self.cfg, jnp.asarray(toks), jnp.asarray(mask))
                )
            for r, j in enumerate(chunk):
                n = len(sequences[j])
                out[j] = tdi[codes3[r, 1 : n + 1]].tobytes().decode()
        return out  # type: ignore[return-value]

    def probe(self) -> bool:
        r = self.predict(["ACDEFGHIKL"])
        return len(r) == 1 and len(r[0]) == 10
