"""Train the first-party TransformerLM on transcript text.

The reference's rescoring LM comes from an EXTERNAL package (`lming`,
reference `eval/tedlium/tlm_beam.py:5-6` — not part of the checkout); this
CLI closes the loop in-repo: transcript text (one utterance per line, e.g.
`data/train_tokenizer.retrieve_all_text` output, the same corpus the BPE
tokenizer is trained on) → next-token training of `models/lm.py:
TransformerLM` → an orbax checkpoint that `cli/lm_rescore beam --lm`
loads directly (embedded-config contract, `load_lm_checkpoint`).

    python -m lcasr_tpu.cli.train_lm -text all_text.txt -save ckpts/lm \
        --d_model 512 --n_layers 6 --steps 20000
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Iterator, List

import numpy as np


def batches_from_text(
    lines: List[str],
    tokenizer,
    batch_size: int,
    seq_len: int,
    seed: int = 1234,
    bos_id: int = 2,
    pad_id: int = 0,
) -> Iterator[np.ndarray]:
    """Endless shuffled (B, seq_len+1) int32 batches: bos + ids, padded.
    Lines longer than seq_len are split into seq_len-token windows so long
    transcripts contribute everything, not just their head."""
    rng = np.random.default_rng(seed)
    rows: List[List[int]] = []
    for line in lines:
        ids = tokenizer.encode(line.strip())
        if not ids:
            continue
        for i in range(0, len(ids), seq_len):
            window = ids[i : i + seq_len]
            if window:
                rows.append([bos_id] + window)
    if not rows:
        raise ValueError("no non-empty tokenized lines in the corpus")
    while True:
        order = rng.permutation(len(rows))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            batch = [rows[j] for j in order[i : i + batch_size]]
            # bucket the padded width (multiple of 32, capped at the row
            # ceiling) so the jitted step compiles once per bucket, not
            # once per distinct max-row-length; padded positions are
            # masked out of lm_loss by `lengths`
            U = max(len(r) for r in batch)
            U = min(-(-U // 32) * 32, seq_len + 1)
            out = np.full((batch_size, U), pad_id, np.int32)
            lengths = np.zeros((batch_size,), np.int32)
            for k, r in enumerate(batch):
                out[k, : len(r)] = r
                lengths[k] = len(r)
            yield out, lengths


def train_lm(
    text_path: str,
    save_dir: str,
    d_model: int = 512,
    n_layers: int = 6,
    n_heads: int = 8,
    head_dim: int = 64,
    batch_size: int = 32,
    seq_len: int = 256,
    lr: float = 3e-4,
    steps: int = 20000,
    save_every: int = 5000,
    log_every: int = 50,
    seed: int = 1234,
) -> str:
    import jax
    import jax.numpy as jnp
    import optax

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.lm import TransformerLM, lm_loss
    from lcasr_tpu.training import checkpointing
    from lcasr_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tokenizer = load_tokenizer()
    lm_cfg = dict(
        vocab_size=tokenizer.vocab_size(), d_model=d_model, n_layers=n_layers,
        n_heads=n_heads, head_dim=head_dim,
    )
    model = TransformerLM(**lm_cfg)
    params = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, 8), jnp.int32)
    )["params"]
    optimizer = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(lr, weight_decay=0.01)
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def step_fn(params, opt_state, tokens, lengths):
        loss, grads = jax.value_and_grad(
            lambda p: lm_loss(model, {"params": p}, tokens, lengths)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with open(text_path) as f:
        lines = [l for l in f if l.strip()]
    it = batches_from_text(lines, tokenizer, batch_size, seq_len, seed=seed)
    cfg = Config({"model_class": "TransformerLM", "model": lm_cfg})

    os.makedirs(save_dir, exist_ok=True)
    metrics = open(os.path.join(save_dir, "metrics.jsonl"), "a")
    t0, path = time.time(), None
    for step in range(1, steps + 1):
        tokens, lengths = next(it)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(tokens), jnp.asarray(lengths)
        )
        if step % log_every == 0 or step == 1:
            metrics.write(json.dumps(
                {"step": step, "loss": float(loss),
                 "wall_s": round(time.time() - t0, 1)}) + "\n")
            metrics.flush()
        if step % save_every == 0 or step == steps:
            path = checkpointing.save_checkpoint(
                save_dir, step=step, params=params, config=cfg
            )
    metrics.close()
    return path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-text", required=True, help="one transcript per line")
    ap.add_argument("-save", required=True, help="checkpoint directory")
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--n_layers", type=int, default=6)
    ap.add_argument("--n_heads", type=int, default=8)
    ap.add_argument("--head_dim", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--seq_len", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--save_every", type=int, default=5000)
    args = ap.parse_args()
    path = train_lm(
        args.text, args.save, d_model=args.d_model, n_layers=args.n_layers,
        n_heads=args.n_heads, head_dim=args.head_dim,
        batch_size=args.batch_size, seq_len=args.seq_len, lr=args.lr,
        steps=args.steps, save_every=args.save_every,
    )
    print(f"saved {path}")


if __name__ == "__main__":
    main()
