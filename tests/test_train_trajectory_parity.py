"""Cross-framework TRAINING-TRAJECTORY parity (VERDICT r3 #3).

The strongest WER-parity proxy available at zero egress: train the actual
torch reference SCConformerXL through a faithful replica of the reference
training protocol (`/root/reference/exp/train.py:80-349` — per-chunk CTC
sum-loss, per-group backward scaling 100·group/(chunk·batch), reference
MADGRAD + CosineLRScheduler with warmup→cosine handoff, global-norm clip)
side by side with this framework's production `Trainer` from
CONVERTED-IDENTICAL initial weights on the same data order, and assert

  * per-optimizer-step logged loss agreement for ≥ 30 steps,
  * final-parameter agreement, and
  * identical greedy transcripts from the trained models.

Piecewise parity (logits, madgrad trajectory, CTC loss, scheduler) is
covered elsewhere; this test is the end-to-end composition of all of them
through real multi-epoch training.
"""
import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow

CHUNK = 256
BATCH = 2
LR = 3e-4
WARMUP = 5
EPOCHS = 6
CLIP = 0.8

MODEL_KW = dict(
    d_model=64,
    n_layers=2,
    n_heads=2,
    head_dim=32,
    subsampling_conv_channels=32,
    expansion_factor=2,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("traj_corpus")
    rng = np.random.default_rng(42)
    pairs = {}
    for i in range(4):
        T = 640 + 80 * i
        spec = rng.normal(size=(1, 80, T)).astype(np.float32)
        np.save(tmp / f"r{i}.spec.npy", spec)
        # words must stay INSIDE the audio with margin: a transcript that
        # runs past the audio end makes the tail chunk CTC-infeasible
        # (targets > subsampled frames) and the reference protocol — no
        # zero_infinity, isnan-only guard — genuinely collapses on it
        words, t = [], 0.15
        for w in (f"podcast {i} has these words " * 8).split():
            if t + 0.25 > T / 100 - 0.7:
                break
            words.append({"word": w, "startTime": f"{t:.2f}s",
                          "endTime": f"{t + 0.25:.2f}s"})
            t += 0.3
        with open(tmp / f"r{i}.json", "w") as f:
            json.dump({"results": [{"alternatives": [{"words": words}]}]}, f)
        pairs[f"r{i}"] = {"audio": str(tmp / f"r{i}.spec.npy"),
                          "txt": str(tmp / f"r{i}.json"),
                          "duration": T / 100}
    return pairs


def _torch_reference_train(torch, model_t, tokenizer, pairs):
    """Faithful replica of the reference training protocol
    (exp/train.py:80-349) driving the torch reference model: reference
    MADGRAD + CosineLRScheduler, per-chunk compacted batches, sum-CTC with
    the 100·group/(chunk·batch) backward scale, clip_grad_norm_, warmup
    stepping inside the optimizer step and cosine stepping per podcast
    batch.  Data order comes from this repo's dataloader (iterated with the
    same epoch-reseed protocol the Trainer uses) so the arms differ ONLY in
    framework + training-loop implementation."""
    import random as pyrandom

    from tests.reference_oracle import load_reference_module

    from lcasr_tpu.data.dataloading import (
        VariableBatchSimpleDataloader,
        reset_seen_ids,
    )

    madgrad_mod = load_reference_module("lcasr/optim/madgrad.py", "ref_madgrad_traj")
    sched_mod = load_reference_module("lcasr/utils/scheduling.py", "ref_sched_traj")

    model_t.train()
    opt = madgrad_mod.MADGRAD(model_t.parameters(), lr=LR)
    scheduler = sched_mod.CosineLRScheduler(
        optimizer=opt, warmup_steps=WARMUP, peak_value=LR, final_value=0.0)
    n_classes = tokenizer.vocab_size() + 1
    ctc_loss_fn = torch.nn.CTCLoss(blank=n_classes - 1, reduction="sum")
    pad_id = tokenizer.pad_id()

    dataloader = VariableBatchSimpleDataloader(
        pairs=pairs, tokenizer=tokenizer, batch_size=BATCH,
        chunk_size=CHUNK, chunk_overlap=0, prefetch=False,
    )
    total_recordings = dataloader.total_recordings() * EPOCHS
    rng = pyrandom.Random(12345)  # trainer default random_seed

    losses, cur_podcast, epoch, seen_ids = [], 0, 0, []
    data_iter = iter(dataloader)
    backprop_every = backwards_every = 1

    from lcasr_tpu.data.dataloading import chunk_spectogram, chunk_text_json

    while True:
        try:
            audio, audio_lengths, txt, ids = next(data_iter)
        except StopIteration:
            epoch += 1
            seen_ids = reset_seen_ids(seen_ids, epoch - 1)
            if epoch >= EPOCHS:
                break
            dataloader.update(batch_size=dataloader.batch_size,
                              seen_ids=seen_ids,
                              random_seed=rng.randint(0, 10000))
            data_iter = iter(dataloader)
            continue
        seen_ids.extend(ids)
        cur_podcast += audio.shape[0]

        audio = torch.from_numpy(np.asarray(audio, np.float32))
        audio_lengths = torch.from_numpy(np.asarray(audio_lengths, np.int64))

        # chunk building — reference exp/train.py:174-201 (compacted batch)
        audio_chunks_ = chunk_spectogram(audio.numpy(), CHUNK, 0)
        txt_chunks = [chunk_text_json(t, CHUNK, 0, audio.shape[-1]) for t in txt]
        chunks, culm = [], torch.zeros_like(audio_lengths)
        for ix, el in enumerate(audio_chunks_):
            el = torch.from_numpy(el)
            remove_mask = ~(culm > audio_lengths)
            cur_chunks, cur_culm = el[remove_mask], culm[remove_mask]
            cur_lengths = cur_chunks.shape[-1] - (
                cur_culm + cur_chunks.shape[-1] - audio_lengths[remove_mask] - 0
            ).clamp(0)
            enc = [torch.LongTensor(tokenizer.encode(t[ix]))
                   for i, t in enumerate(txt_chunks) if remove_mask[i]]
            enc_lengths = torch.LongTensor([e.shape[0] for e in enc])
            enc = torch.nn.utils.rnn.pad_sequence(
                enc, batch_first=True, padding_value=pad_id)
            if enc_lengths.max() == 0:
                continue  # reference :191-192 (culm NOT updated on skip)
            chunks.append({"audio": cur_chunks, "txt": enc,
                           "txt_lengths": enc_lengths,
                           "audio_lengths": cur_lengths})
            culm[remove_mask] += cur_chunks.shape[-1]

        # warmup → cosine handoff (reference :203-207)
        if scheduler.is_warmup:
            scheduler.is_warmup = scheduler.is_warming_up()
            if not scheduler.is_warmup:
                scheduler.set_cosine_schedule(
                    total_recordings=total_recordings, cur_podcast=cur_podcast)

        cur_loss, cur_tokens = torch.tensor(0.0), 0
        bw_loss, steps_since_bw = 0.0, 0
        for ix, ch in enumerate(chunks):
            out = model_t(audio_signal=ch["audio"],
                          length=ch["audio_lengths"])
            loss = ctc_loss_fn(out["final_posteriors"].transpose(0, 1),
                               ch["txt"], out["length"],
                               ch["txt_lengths"]).sum()
            cur_loss = cur_loss + loss
            bw_loss = bw_loss + loss
            steps_since_bw += 1
            cur_tokens += int(ch["audio_lengths"].sum())
            is_last = ix + 1 == len(chunks)
            if (ix + 1) % backwards_every == 0 or is_last:
                ((bw_loss / (CHUNK * BATCH) * steps_since_bw) * 100).backward()
                bw_loss, steps_since_bw = 0.0, 0
            if (ix + 1) % backprop_every == 0 or is_last:
                full_loss = float(cur_loss) / cur_tokens * 100
                torch.nn.utils.clip_grad_norm_(model_t.parameters(), CLIP)
                opt.step()
                opt.zero_grad()
                if scheduler.is_warmup:
                    scheduler.step()
                losses.append(full_loss)
                cur_loss, cur_tokens = torch.tensor(0.0), 0
        if not scheduler.is_warmup:
            scheduler.step(epoch=cur_podcast)
    return losses


def test_training_trajectory_parity(corpus, tmp_path):
    torch = pytest.importorskip("torch")
    from tests.reference_oracle import (
        install_reference_package_stubs,
        load_reference_module,
        reference_available,
    )

    if not reference_available():
        pytest.skip("reference checkout not present")
    install_reference_package_stubs()
    ref_mod = load_reference_module(
        "lcasr/models/sconformer_xl.py", "ref_sconformer_traj")

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.import_torch import variables_from_torch
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training.trainer import Trainer

    tokenizer = load_tokenizer()
    vocab = tokenizer.vocab_size()

    torch.manual_seed(7)
    model_t = ref_mod.SCConformerXL(
        vocab_size=vocab, flash_attn=False, **MODEL_KW)
    sd0 = {k: v.detach().clone().numpy()
           for k, v in model_t.state_dict().items()}

    # ---- JAX arm: the production Trainer from converted-identical init ----
    cfg = Config({
        "model_class": "SCConformerXL",
        "model": {**MODEL_KW, "use_pallas": False},
        "audio_chunking": {"size": CHUNK, "overlap": 0},
        "training": {"batch_size": BATCH, "backprop_every": 1,
                     "max_epochs": EPOCHS, "clip_value": CLIP,
                     "random_seed": 12345},
        "optimizer": {"name": "madgrad", "args": {"lr": LR}},
        "scheduler": {"warmup_steps": WARMUP, "final_value": 0.0},
        "checkpointing": {"dir": str(tmp_path / "ckpt"),
                          "save_every_n_steps": 10 ** 6},
    })
    model_j = load_model(cfg, vocab)
    trainer = Trainer(cfg, model_j, tokenizer)
    state = trainer.init_state(jax.random.PRNGKey(0))
    converted = variables_from_torch(
        sd0, dict(vocab_size=vocab, **MODEL_KW))
    state["params"] = converted["params"]
    state["batch_stats"] = converted.get("batch_stats", {})
    state["opt_state"] = trainer.optimizer.init(state["params"])
    dataloader = VariableBatchSimpleDataloader(
        pairs=corpus, tokenizer=tokenizer, batch_size=BATCH,
        chunk_size=CHUNK, chunk_overlap=0, prefetch=False,
    )
    with jax.default_matmul_precision("highest"):
        state = trainer.train(state, dataloader)
    lines = [json.loads(l) for l in open(
        os.path.join(trainer.checkpoint_dir, "metrics.jsonl"))]
    losses_j = [l["loss"] for l in lines if "loss" in l]

    # ---- torch arm: the reference protocol on the reference model ----
    losses_t = _torch_reference_train(torch, model_t, tokenizer, corpus)

    assert len(losses_t) >= 30, f"only {len(losses_t)} optimizer steps"
    assert len(losses_j) == len(losses_t)
    # warmup steps (lr ramping from 0): trajectories must be essentially
    # exact — any semantic mismatch (loss scale, scheduler, clip) shows
    # here undamped by optimizer chaos
    np.testing.assert_allclose(losses_j[:WARMUP], losses_t[:WARMUP],
                               rtol=1e-4, atol=1e-4)
    # after lr reaches peak the loss surface curvature amplifies fp
    # reduction-order differences between frameworks (bit-exactness is
    # impossible); require every step within 2% and NO systematic bias
    # (mean signed relative error ~0) — a semantic divergence (e.g. the
    # r3 lr-cache bug this test caught) produces a one-sided drift
    rel = (np.asarray(losses_j) - np.asarray(losses_t)) / np.asarray(losses_t)
    np.testing.assert_allclose(losses_j, losses_t, rtol=2e-2, atol=5e-3)
    assert abs(float(rel.mean())) < 5e-3, f"systematic bias: {rel.mean():.4f}"

    # final-parameter agreement: convert the TRAINED torch weights and
    # compare against the TRAINED jax params — end-to-end optimizer/clip/
    # scheduler/batch-stat composition, not just loss-surface agreement
    sd1 = {k: v.detach().numpy() for k, v in model_t.state_dict().items()}
    trained_t = variables_from_torch(sd1, dict(vocab_size=vocab, **MODEL_KW))
    flat_j = jax.tree_util.tree_leaves_with_path(state["params"])
    flat_t = dict(jax.tree_util.tree_leaves_with_path(trained_t["params"]))
    # params moved materially from init...
    init_t = variables_from_torch(sd0, dict(vocab_size=vocab, **MODEL_KW))
    flat_i = dict(jax.tree_util.tree_leaves_with_path(init_t["params"]))
    moved = max(float(np.abs(np.asarray(flat_t[p]) - np.asarray(flat_i[p])).max())
                for p, _ in flat_j)
    assert moved > 1e-3, "training did not move the parameters"
    # ...and both frameworks moved them to the same place.  GLOBAL relative
    # Frobenius distance over the whole parameter vector must be tight;
    # per-leaf only loosely bounded (tiny-gradient directions like norm
    # biases accumulate the most relative fp-chaos under madgrad's adaptive
    # denominator — measured ≤8% here when healthy; a semantic divergence
    # like the r3 lr-cache bug blows far past these)
    num = den = 0.0
    worst, worst_path = 0.0, None
    for path, leaf in flat_j:
        a, b = np.asarray(leaf, np.float32), np.asarray(flat_t[path], np.float32)
        d2 = float(np.sum((a - b) ** 2))
        b2 = float(np.sum(b ** 2))
        num += d2
        den += b2
        rel = (d2 / b2) ** 0.5 if b2 else 0.0
        rms = (d2 / a.size) ** 0.5
        if rms < 5e-3:
            # near-zero-norm leaves (e.g. norm biases that barely moved
            # from init 0): relative distance is meaningless there — gate
            # on absolute RMS drift instead
            rel = 0.0
        if rel > worst:
            worst, worst_path = rel, jax.tree_util.keystr(path)
    global_rel = (num / den) ** 0.5
    assert global_rel < 2e-2, f"global param divergence: {global_rel:.4f}"
    assert worst < 0.15, f"param diverged: {worst_path} rel_frob={worst:.4f}"

    # identical greedy transcripts from the trained models
    spec = np.load(corpus["r0"]["audio"]).astype(np.float32)
    model_t.eval()
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(spec))
    ids_t = out_t["final_posteriors"].numpy().argmax(-1)[0]
    with jax.default_matmul_precision("highest"):
        out_j = model_j.apply(
            {"params": state["params"], "batch_stats": state["batch_stats"]},
            jnp.asarray(spec))
    ids_j = np.asarray(out_j["final_posteriors"]).argmax(-1)[0]
    blank = vocab
    collapse = lambda ids: [int(i) for i, p in zip(ids, [blank] + list(ids[:-1]))
                            if i != blank and i != p]
    assert collapse(ids_j) == collapse(ids_t)
