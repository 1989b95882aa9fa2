"""Experiment launcher: template expansion + job submission + crash restarts.

Counterparts of reference `exp/run_launcher.py:51-84` and
`exp/run_restarter.py:39-73`:

  * a template YAML carries a `template_info` block whose `template_keys`
    are dot-paths with per-run LIST values (e.g. 12 runs = 4 seq lens × 3
    seeds); `expand_template` writes N concrete configs,
  * `submit` renders a job script per config (SLURM template or plain shell),
  * `restart` resubmits a crashed run with the same config/run id but a
    RE-RANDOMIZED data seed, dodging the offending batch (reference
    `run_restarter.py:49-52,69`).
"""
from __future__ import annotations

import argparse
import os
import random
import subprocess
from typing import Any, Dict, List

import yaml

from lcasr_tpu.config import Config

DEFAULT_JOB_TEMPLATE = """#!/bin/bash
#SBATCH --time=96:00:00
#SBATCH --mem=150G
#SBATCH --output={log_path}
python -m lcasr_tpu.cli.train -config {config_path}
"""


from lcasr_tpu.utils.resources import find_repo_file

DEFAULT_ZOO = find_repo_file(os.path.join("configs", "model_zoo.yaml"))


def apply_zoo_model(template: Dict[str, Any], model_name: str,
                    zoo_path: str = None) -> Dict[str, Any]:
    """Overlay a model-zoo entry's dot-path overrides onto a template.

    Collapses the reference's 13 per-model paper-template files
    (`exp/configs/paper_templates/*.yaml`) into one launcher template ×
    one zoo table (`configs/model_zoo.yaml`).  Intermediate mappings are
    created as needed, so a zoo entry may override keys the template omits.
    """
    with open(zoo_path or DEFAULT_ZOO) as f:
        zoo = yaml.safe_load(f)["zoo"]
    if model_name not in zoo:
        raise ValueError(
            f"unknown zoo model {model_name!r}; available: {sorted(zoo)}"
        )
    for path, value in (zoo[model_name].get("overrides") or {}).items():
        node = template
        parts = path.split(".")
        for p in parts[:-1]:
            # an empty YAML section (`scheduler:`) parses to None — treat it
            # as an empty mapping rather than failing on None.setdefault
            if not isinstance(node.get(p), dict):
                node[p] = {}
            node = node[p]
        node[parts[-1]] = value
    return template


def expand_template(template_path: str, out_dir: str,
                    zoo_model: str = None, zoo_path: str = None) -> List[str]:
    with open(template_path) as f:
        template = yaml.safe_load(f)
    if zoo_model:
        template = apply_zoo_model(template, zoo_model, zoo_path)
    info = template.pop("template_info", {})
    keys: List[str] = info.get("template_keys", [])
    if not keys:
        raise ValueError("template_info.template_keys missing")

    def get_path(d: Dict[str, Any], path: str):
        node = d
        for p in path.split("."):
            node = node[p]
        return node

    def set_path(d: Dict[str, Any], path: str, value):
        node = d
        parts = path.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = value

    n_runs = len(get_path(template, keys[0]))
    for k in keys:
        assert len(get_path(template, k)) == n_runs, (
            f"template key {k} must list {n_runs} values"
        )

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    base = os.path.splitext(os.path.basename(template_path))[0]
    if zoo_model:
        base = f"{base}_{zoo_model}"
    for run in range(n_runs):
        cfg = yaml.safe_load(yaml.safe_dump(template))  # deep copy
        for k in keys:
            set_path(cfg, k, get_path(template, k)[run])
        path = os.path.join(out_dir, f"{base}_run{run}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        paths.append(path)
    return paths


def submit(config_paths: List[str], job_template: str = DEFAULT_JOB_TEMPLATE,
           submit_cmd: str = "sbatch", dry_run: bool = False) -> List[str]:
    scripts = []
    for cfg_path in config_paths:
        script = job_template.format(
            config_path=cfg_path, log_path=cfg_path.replace(".yaml", ".log")
        )
        script_path = cfg_path.replace(".yaml", ".sh")
        with open(script_path, "w") as f:
            f.write(script)
        scripts.append(script_path)
        if not dry_run:
            subprocess.run([submit_cmd, script_path], check=False)
    return scripts


def restart(config_path: str, dry_run: bool = False,
            keep_seed: bool = False, seed: str = "random") -> str:
    """Resubmit a crashed run with a fresh data seed (same run identity).

    Mirrors `run_restarter.py:49-60`: the seed is re-randomized by default
    to dodge the batch that caused the crash; `keep_seed` preserves it and
    `seed` pins an explicit integer instead of a random draw."""
    if not keep_seed:
        cfg = Config.load(config_path)
        new_seed = (
            random.randint(0, 1000000) if seed == "random" else int(seed)
        )
        cfg = cfg.apply_overrides([f"training.random_seed={new_seed}"])
        cfg.save(config_path)
        print(f"re-randomized data seed -> {new_seed}")
    if not dry_run:
        submit([config_path])
    return config_path


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    e = sub.add_parser("expand")
    e.add_argument("-template", required=True)
    e.add_argument("-out", required=True)
    e.add_argument("--model", default=None,
                   help="model-zoo entry to overlay (configs/model_zoo.yaml)")
    e.add_argument("--zoo", default=None, help="alternate zoo file")
    e.add_argument("--submit", action="store_true")
    e.add_argument("--dry_run", action="store_true")
    r = sub.add_parser("restart")
    r.add_argument("-config", required=True, nargs="+",
                   help="one or more run configs to resubmit")
    r.add_argument("--dry_run", action="store_true")
    r.add_argument("--keep_seed", action="store_true",
                   help="do not re-randomize the data seed")
    r.add_argument("--seed", default="random",
                   help="'random' or an explicit integer seed")
    args = parser.parse_args()

    if args.cmd == "expand":
        paths = expand_template(args.template, args.out,
                                zoo_model=args.model, zoo_path=args.zoo)
        print("\n".join(paths))
        if args.submit:
            submit(paths, dry_run=args.dry_run)
    elif args.cmd == "restart":
        for cfg_path in args.config:
            restart(cfg_path, dry_run=args.dry_run,
                    keep_seed=args.keep_seed, seed=args.seed)


if __name__ == "__main__":
    main()
