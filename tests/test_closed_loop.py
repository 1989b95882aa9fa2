"""End-to-end closed loop (VERDICT r2 next-step #2): train a tiny model on a
synthetic word-pattern corpus with the PRODUCTION Trainer until it overfits,
save through `training/checkpointing`, decode the held-in recordings through
the PRODUCTION eval pipeline (`evaluation/run.evaluate`, averaged moving
window), and assert the WER collapses — then re-run the eval with the int8
spectrogram transfer and pipelined upload opt-ins and assert the WER is
unchanged, certifying both (ROADMAP "int8 needs WER validation").

The reference's analogous golden signal is its results CSVs
(`/root/reference/eval/results/IS_paper/evals_rb.csv`); real corpora are not
mountable here (zero egress), so the corpus is synthetic but the SYSTEM under
test is the real one: dataloader → chunking → Trainer → checkpoint →
embedded-config model rebuild → StreamingDecoder → greedy decode → Whisper
normalizer → WER.
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

# ~8 distinct words; each word is rendered as a fixed random spectrogram
# pattern (seeded by the word), so the mapping audio→text is deterministic
# and learnable by a tiny conformer
LEXICON = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel"]
FRAMES_PER_WORD = 64  # 8 output frames after 8x subsampling


def _word_pattern(word: str) -> np.ndarray:
    # hashlib, NOT hash(): str hashing is randomized per process, which made
    # the corpus (and the converged WER) vary run to run
    import hashlib

    seed = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.normal(size=(80, FRAMES_PER_WORD)).astype(np.float32) * 0.5


def _render(words):
    spec = np.concatenate([_word_pattern(w) for w in words], axis=1)
    timing = []
    t = 0.0
    dur = FRAMES_PER_WORD / 100.0
    for w in words:
        timing.append(
            {"word": w, "startTime": f"{t:.2f}s", "endTime": f"{t + dur:.2f}s"}
        )
        t += dur
    return spec[None], timing


@pytest.fixture(scope="module")
def synth_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("closed_loop")
    rng = np.random.default_rng(0)
    pairs = {}
    for i in range(4):
        words = list(rng.permutation(LEXICON))
        spec, timing = _render(words)
        np.save(tmp / f"s{i}.spec.npy", spec)
        with open(tmp / f"s{i}.json", "w") as f:
            json.dump({"results": [{"alternatives": [{"words": timing}]}]}, f)
        pairs[f"s{i}"] = {
            "audio": str(tmp / f"s{i}.spec.npy"),
            "txt": str(tmp / f"s{i}.json"),
            "duration": spec.shape[-1] / 100,
        }
    pairs_path = tmp / "pairs.json"
    with open(pairs_path, "w") as f:
        json.dump(pairs, f)
    return str(pairs_path), str(tmp)


def test_train_checkpoint_eval_wer_closed_loop(synth_corpus, tmp_path):
    import jax

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader, load_json
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.evaluation.run import evaluate
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training.trainer import Trainer

    pairs_path, _ = synth_corpus
    ckpt_dir = tmp_path / "ckpts"

    cfg = Config({
        "model_class": "SCConformerXL",
        # conv_norm=layer_norm: batch-RENORM would eval with its RUNNING
        # stats, which at this tiny step count (~120) are only ~70% converged
        # toward the batch statistics (momentum 0.01) — a real-model eval
        # after 100k+ steps doesn't have that problem, a 3-minute closed loop
        # does.  Renorm train/eval parity is covered by tests/test_model.py.
        "model": {"d_model": 96, "n_layers": 2, "n_heads": 2, "head_dim": 48,
                  "subsampling_conv_channels": 32, "use_pallas": False,
                  "conv_norm": "layer_norm"},
        "audio_chunking": {"size": 512, "overlap": 0},
        # flat 3e-3 (final == peak): the cosine decay slows the blank-collapse
        # escape; 400 epochs x 2 batches ≈ 800 optimizer steps reach WER 0.0
        # on the (now deterministic, md5-seeded) corpus — 250 left 1/32
        # errors, which also let int8 quantization flip a marginal word
        "training": {"batch_size": 2, "backprop_every": 1, "max_epochs": 400,
                     "clip_value": 1.0, "random_seed": 1234},
        "optimizer": {"name": "madgrad", "args": {"lr": 3e-3}},
        "scheduler": {"warmup_steps": 5, "final_value": 3e-3},
        "checkpointing": {"dir": str(ckpt_dir), "save_every_n_steps": 10**9},
    })
    tokenizer = load_tokenizer()
    model = load_model(cfg, tokenizer.vocab_size())
    trainer = Trainer(cfg, model, tokenizer)
    state = trainer.init_state(jax.random.PRNGKey(0))
    dataloader = VariableBatchSimpleDataloader(
        pairs=load_json(pairs_path), tokenizer=tokenizer,
        batch_size=2, chunk_size=512, chunk_overlap=0, random_seed=1234,
    )
    state = trainer.train(state, dataloader)

    # the final save happens inside train(); locate the checkpoint
    from lcasr_tpu.training.checkpointing import find_latest_checkpoint

    ckpt = find_latest_checkpoint(str(ckpt_dir))
    assert ckpt is not None

    # training actually converged (loss per frame collapsed)
    lines = [json.loads(l) for l in open(os.path.join(str(ckpt_dir), "metrics.jsonl"))]
    losses = [l["loss"] for l in lines if "loss" in l]
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])

    common = dict(
        checkpoint=ckpt,
        dataset="spotify",  # the pairs-on-disk adapter
        dataset_kwargs={"pairs_path": pairs_path},
        seq_len=512,
        overlap=256,
        verbose=False,
    )
    summary = evaluate(**common)
    assert summary["words"] > 0
    assert summary["wer"] <= 0.05, summary["wer"]

    # int8 spectrogram transfer + pipelined upload must be WER-neutral
    # (certifies the two opt-in transfer optimizations end to end)
    summary_opt = evaluate(
        **common, transfer_dtype="int8", pipeline_upload=True
    )
    assert summary_opt["wer"] == summary["wer"], (
        summary_opt["wer"], summary["wer"],
    )

    # int4 packed transfer (two codes/byte, per-mel-bin affine) must hold
    # the converged WER too — the certification that lets the decode default
    # drop to 4-bit uploads on link-bound hosts
    summary_i4 = evaluate(**common, transfer_dtype="int4")
    assert summary_i4["wer"] == summary["wer"], (
        summary_i4["wer"], summary["wer"],
    )

    # W8A8 quantized serving (int8 MXU projections, ops/qdense.py) must hold
    # the converged WER — the certification that makes the opt-in shippable
    summary_q = evaluate(**common, quant_w8a8=True)
    assert summary_q["wer"] == summary["wer"], (
        summary_q["wer"], summary["wer"],
    )

    # data-parallel decode (window batch sharded over the mesh data axis)
    # must be WER-neutral too — certified at the same trained-model level
    import jax

    if jax.device_count() >= 8:
        summary_dp = evaluate(**common, data_parallel=True)
        assert summary_dp["wer"] == summary["wer"], (
            summary_dp["wer"], summary["wer"],
        )

    # serving certification: the ONLINE transcriber (incremental frame feed,
    # sliding fixed-shape window, lookahead finalization) reaches the same
    # WER 0 on the trained model — streamed in small chunks
    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.evaluation.run import load_any_checkpoint
    from lcasr_tpu.evaluation.wer import word_error_rate_detail
    from lcasr_tpu.models.registry import get_model_class, load_model
    from lcasr_tpu.serving import OnlineTranscriber

    cfg_ck, variables = load_any_checkpoint(ckpt)
    tokenizer = load_tokenizer()
    model = load_model(
        Config({"model": cfg_ck.get("model", Config({})).to_dict()}),
        tokenizer.vocab_size(), get_model_class(cfg_ck),
    )
    hyps, refs = [], []
    for rec_id, pair in json.load(open(pairs_path)).items():
        spec = np.load(pair["audio"])[0]  # (80, T), the model's input as-is
        gold = json.load(open(pair["txt"]))
        words = [w["word"] for w in gold["results"][0]["alternatives"][0]["words"]]
        # full-attention model: the context window must cover the whole
        # 512-frame recording for the finalized logits to match a full
        # forward (no bounded receptive field to hide behind)
        tr = OnlineTranscriber(model, variables, tokenizer, context_frames=512,
                               stride_frames=128, right_delay_frames=128,
                               norm="none")
        for t0 in range(0, spec.shape[1], 100):
            tr.feed_frames(spec[:, t0 : t0 + 100])
        tr.finish()
        hyps.append(tr.text)
        refs.append(" ".join(words))
    wer_stream, _, _, _, _ = word_error_rate_detail(hyps, refs)
    assert wer_stream <= 0.05, (wer_stream, hyps[0], refs[0])

    # int8 window/strip uploads (serving transfer_dtype) must hold the
    # trained model's WER — the serving-side counterpart of the offline
    # int8 certification above
    hyps_q = []
    for rec_id, pair in json.load(open(pairs_path)).items():
        spec = np.load(pair["audio"])[0]
        tr = OnlineTranscriber(model, variables, tokenizer, context_frames=512,
                               stride_frames=128, right_delay_frames=128,
                               norm="none", transfer_dtype="int8")
        tr.feed_frames(spec)  # backlog: exercises the quantized strip path
        tr.finish()
        hyps_q.append(tr.text)
    wer_q, _, _, _, _ = word_error_rate_detail(hyps_q, refs)
    assert wer_q <= 0.05, (wer_q, hyps_q[0], refs[0])

    # LM-rescoring pipeline on the SAME trained artifacts (reference §3.4:
    # create_logits → tlm_beam): dump moving-window logits with the trained
    # AM, train a tiny TransformerLM on the corpus transcripts with the
    # production cli/train_lm, then frame_sync-rescore the dumps two
    # recordings per device call — LM fusion must keep the converged WER
    from lcasr_tpu.cli.lm_rescore import beam_stage, create_logits
    from lcasr_tpu.cli.train_lm import train_lm

    ldir = tmp_path / "logits"
    create_logits(
        ckpt, "spotify", "test", str(ldir), seq_len=512, overlap=256,
        dataset_kwargs={"pairs_path": pairs_path},
    )
    texts = []
    for rec_id, pair in json.load(open(pairs_path)).items():
        gold = json.load(open(pair["txt"]))
        texts.append(
            " ".join(w["word"] for w in gold["results"][0]["alternatives"][0]["words"])
        )
    text_path = tmp_path / "all_text.txt"
    text_path.write_text("\n".join(texts))
    lm_ckpt = train_lm(
        str(text_path), str(tmp_path / "lm"), d_model=64, n_layers=1,
        n_heads=2, head_dim=32, batch_size=2, seq_len=64, steps=20,
        save_every=10**9, log_every=10**9,
    )
    wer_rescored = beam_stage(
        str(ldir), alpha=0.2, beta=0.4, beam_width=8, lm=lm_ckpt,
        decoder="frame_sync", parallel_recordings=2,
    )
    assert wer_rescored <= summary["wer"] + 1e-9, (wer_rescored, summary["wer"])


def test_enc_dec_closed_loop(synth_corpus, tmp_path):
    """Golden loop for the AED family: production Trainer (loss_mode
    enc_dec, joint CTC+CE per reference exp/train_enc_dec.py) → checkpoint →
    KV-cached greedy generation → WER 0 (proves attention-decoder training
    produces checkpoints whose autoregressive decode is correct)."""
    import jax

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader, load_json
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.evaluation.normalizer import normalize
    from lcasr_tpu.evaluation.run import load_any_checkpoint
    from lcasr_tpu.evaluation.wer import word_error_rate_detail
    from lcasr_tpu.models.enc_dec_sconformer import generate_greedy_cached
    from lcasr_tpu.models.registry import get_model_class, load_model
    from lcasr_tpu.training.checkpointing import find_latest_checkpoint
    from lcasr_tpu.training.trainer import Trainer

    pairs_path, _ = synth_corpus
    ckpt_dir = tmp_path / "ckpts_aed"
    cfg = Config({
        "model_class": "EncDecSconformer",
        "model": {"d_model": 96, "n_layers": 2, "n_heads": 2, "head_dim": 48,
                  "decoder_layers": 2, "subsampling_conv_channels": 32,
                  "use_pallas": False},
        "audio_chunking": {"size": 512, "overlap": 0},
        "training": {"batch_size": 2, "backprop_every": 1, "max_epochs": 300,
                     "clip_value": 1.0, "random_seed": 1234,
                     "loss_mode": "enc_dec", "ctc_loss_weight": 0.3},
        "optimizer": {"name": "madgrad", "args": {"lr": 3e-3}},
        "scheduler": {"warmup_steps": 5, "final_value": 3e-3},
        "checkpointing": {"dir": str(ckpt_dir), "save_every_n_steps": 10**9},
    })
    tokenizer = load_tokenizer()
    model = load_model(cfg, tokenizer.vocab_size())
    trainer = Trainer(cfg, model, tokenizer)
    state = trainer.init_state(jax.random.PRNGKey(0))
    dataloader = VariableBatchSimpleDataloader(
        pairs=load_json(pairs_path), tokenizer=tokenizer,
        batch_size=2, chunk_size=512, chunk_overlap=0, random_seed=1234,
    )
    state = trainer.train(state, dataloader)
    ckpt = find_latest_checkpoint(str(ckpt_dir))
    assert ckpt is not None

    cfg_ck, variables = load_any_checkpoint(ckpt)
    model = load_model(
        Config({"model": cfg_ck.get("model", Config({})).to_dict()}),
        tokenizer.vocab_size(), get_model_class(cfg_ck),
    )
    hyps, refs = [], []
    for rec_id, pair in json.load(open(pairs_path)).items():
        spec = np.load(pair["audio"]).astype(np.float32)  # (1, 80, T)
        gold = json.load(open(pair["txt"]))
        words = [w["word"] for w in gold["results"][0]["alternatives"][0]["words"]]
        # bos=0 / eos=0: calc_loss's defaults, which the trainer now
        # follows (the reference training loop never overrides them)
        ids = generate_greedy_cached(
            model, variables, spec, max_generate=64, bos_id=0, eos_id=0,
        )
        hyps.append(normalize(tokenizer.decode(ids)).lower())
        refs.append(normalize(" ".join(words)).lower())
    wer, _, _, _, _ = word_error_rate_detail(hyps, refs)
    assert wer <= 0.05, (wer, hyps[0], refs[0])


def test_mamba_closed_loop(synth_corpus, tmp_path):
    """Same golden loop for the Mamba family: production Trainer →
    checkpoint → production eval → WER 0 (proves the SSM encoder + its
    selective-scan VJP train models whose checkpoints decode correctly)."""
    import jax

    from lcasr_tpu.config import Config
    from lcasr_tpu.data.dataloading import VariableBatchSimpleDataloader, load_json
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.evaluation.run import evaluate
    from lcasr_tpu.models.registry import load_model
    from lcasr_tpu.training.checkpointing import find_latest_checkpoint
    from lcasr_tpu.training.trainer import Trainer

    pairs_path, _ = synth_corpus
    ckpt_dir = tmp_path / "ckpts_mamba"
    cfg = Config({
        "model_class": "Mamba",
        "model": {"d_model": 96, "n_layers": 2, "subsampling_conv_channels": 32},
        "audio_chunking": {"size": 512, "overlap": 0},
        "training": {"batch_size": 2, "backprop_every": 1, "max_epochs": 200,
                     "clip_value": 1.0, "random_seed": 1234},
        "optimizer": {"name": "madgrad", "args": {"lr": 3e-3}},
        "scheduler": {"warmup_steps": 5, "final_value": 3e-3},
        "checkpointing": {"dir": str(ckpt_dir), "save_every_n_steps": 10**9},
    })
    tokenizer = load_tokenizer()
    model = load_model(cfg, tokenizer.vocab_size())
    trainer = Trainer(cfg, model, tokenizer)
    state = trainer.init_state(jax.random.PRNGKey(0))
    dataloader = VariableBatchSimpleDataloader(
        pairs=load_json(pairs_path), tokenizer=tokenizer,
        batch_size=2, chunk_size=512, chunk_overlap=0, random_seed=1234,
    )
    state = trainer.train(state, dataloader)
    ckpt = find_latest_checkpoint(str(ckpt_dir))
    assert ckpt is not None
    summary = evaluate(
        checkpoint=ckpt, dataset="spotify",
        dataset_kwargs={"pairs_path": pairs_path},
        seq_len=512, overlap=256, verbose=False,
    )
    assert summary["words"] > 0
    assert summary["wer"] <= 0.05, summary["wer"]
