"""Launcher protocol tests: run launchers/train-clip.sh with a PATH-stubbed
`python` that records its argv, and assert the 45-task grid mapping (task id
-> seed x domain x mixture, reference slurm/train-clip.sh:22-107) and the
lockfile/resume/removal protocol (reference :123-141)."""

import os
import stat
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAUNCHER = os.path.join(REPO, "launchers", "train-clip.sh")


def _run(tmp_path, task_id, env_extra=None):
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir(exist_ok=True)
    args_out = tmp_path / f"argv_{task_id}.txt"
    if args_out.exists():
        args_out.unlink()
    stub = bin_dir / "python"
    stub.write_text(f'#!/bin/bash\necho "$@" >> "{args_out}"\n')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    env = dict(os.environ, PATH=f"{bin_dir}:{os.environ['PATH']}",
               TASK_ID=str(task_id), **(env_extra or {}))
    proc = subprocess.run(
        ["bash", LAUNCHER], cwd=tmp_path, env=env,
        capture_output=True, text=True, timeout=60)
    argv = args_out.read_text().split() if args_out.exists() else []
    return proc, argv


def _flag(argv, name):
    for i, a in enumerate(argv):
        if a == name:
            return argv[i + 1]
        if a.startswith(name + "="):
            return a.split("=", 1)[1]
    return None


# (task_id, seed, expected DATAID) — mapping per the reference's SLURM array
# (slurm/train-clip.sh): %5 -> domain; <=5 low-diversity pair, <=10 all six
# domains, <=15 leave-out-domain; +15/+30 -> seeds 1/2.
GRID = [
    (1, "0", "lso-cr-noclipartclasses"),
    (5, "0", "lso-rs-nosketchclasses"),
    (7, "0", "lso-cipqrs-noinfographclasses"),
    (10, "0", "lso-cipqrs-nosketchclasses"),
    (13, "0", "lso-ciqrs-nopaintingclasses"),
    (14, "0", "lso-ciprs-noquickdrawclasses"),
    (15, "0", "lso-cipqr-nosketchclasses"),
    (16, "1", "lso-cr-noclipartclasses"),
    (31, "2", "lso-cr-noclipartclasses"),
    (45, "2", "lso-cipqr-nosketchclasses"),
]


@pytest.mark.parametrize("task_id,seed,dataid", GRID)
def test_grid_mapping(tmp_path, task_id, seed, dataid):
    proc, argv = _run(tmp_path, task_id)
    assert proc.returncode == 0, proc.stderr
    assert argv, proc.stdout
    assert _flag(argv, "--train-data") == f"data/indices/combined-captions-train-{dataid}.tsv"
    assert _flag(argv, "--val-data") == f"data/indices/combined-captions-val-{dataid}.tsv"
    assert _flag(argv, "--seed") == seed
    assert _flag(argv, "--name") == f"clip/RN50-{dataid}-s{seed}"
    # reference RN50 headline config: batch 128, accum 2, 32 epochs
    assert _flag(argv, "--batch-size") == "128"
    assert _flag(argv, "--accum-freq") == "2"
    assert _flag(argv, "--epochs") == "32"
    assert "--resume" not in argv


def test_non_rn50_batch_config(tmp_path):
    proc, argv = _run(tmp_path, 1, {"MODEL": "ViT-B-32"})
    assert proc.returncode == 0, proc.stderr
    assert _flag(argv, "--batch-size") == "256"
    assert _flag(argv, "--accum-freq") == "1"


def test_lockfile_resume_protocol(tmp_path):
    name = "clip/RN50-lso-cr-noclipartclasses-s0"

    # fully trained -> abort without invoking python
    ckpts = tmp_path / "logs" / name / "checkpoints"
    ckpts.mkdir(parents=True)
    (ckpts / "epoch_32.pt").write_bytes(b"x")
    proc, argv = _run(tmp_path, 1)
    assert proc.returncode == 0 and "fully trained" in proc.stdout
    assert not argv
    (ckpts / "epoch_32.pt").unlink()

    # running lockfile -> abort without invoking python
    lock = tmp_path / "logs" / "clip" / ".RUNNING_RN50-lso-cr-noclipartclasses-s0"
    lock.write_bytes(b"")
    proc, argv = _run(tmp_path, 1)
    assert proc.returncode == 0 and "running" in proc.stdout
    assert not argv
    lock.unlink()

    # partially trained -> resume latest; lockfile cleaned up on exit
    (ckpts / "epoch_latest.pt").write_bytes(b"x")
    proc, argv = _run(tmp_path, 1)
    assert proc.returncode == 0, proc.stderr
    assert _flag(argv, "--resume") == "latest"
    assert not lock.exists()
    assert (ckpts / "epoch_latest.pt").exists()  # resumable dir kept

    # stale dir (no latest checkpoint) -> removed, fresh start
    (ckpts / "epoch_latest.pt").unlink()
    proc, argv = _run(tmp_path, 1)
    assert proc.returncode == 0, proc.stderr
    assert "Removing" in proc.stdout
    assert "--resume" not in argv
    assert not (tmp_path / "logs" / name).exists()


OTHER_LAUNCHERS = [
    ("train-clip-ccxm.sh",
     {"DATAID": "lso-cipqrs-nosketchclasses", "MODE": "cc12m", "SEED": "1"},
     {"--train-data": "data/indices/cc12m-train-lso-cipqrs-nosketchclasses.tsv",
      "--warmup": "2000", "--batch-size": "128", "--accum-freq": "2",
      "--name": "clip-ccxm/RN50-cc12m-lso-cipqrs-nosketchclasses-s1"}),
    ("train-supervised.sh",
     {"DATAID": "lso-cr-noclipartclasses", "LR": "0.05"},
     {"--train_index_path": "data/indices/combined-captions-train-lso-cr-noclipartclasses.tsv",
      "--experiment_name": "supervised-lso-cr-noclipartclasses-lr0.05",
      "--learning_rate": "0.05", "--batch_size": "256", "--max_epochs": "90"}),
    ("evaluate-clip.sh",
     {"MODEL_DIR": "logs/clip/RN50-x", "DOMAIN": "sketch",
      "IMAGENET": "/data/in", "DOMAINNET": "/data/dn"},
     {"--model": "RN50", "--domain": "sketch", "--imagenet_path": "/data/in",
      "--out_path": "logs/clip/RN50-x/lso-eval-sketch"}),
    ("evaluate-supervised.sh",
     {"CKPT_DIR": "ckpts", "DOMAIN": "painting", "DOMAINNET": "/data/dn"},
     {"--model": "rn50-clip", "--domain": "painting",
      "--out_path": "ckpts/lso-eval-painting"}),
    ("train-sae.sh",
     {"CKPT": "logs/x/epoch_32.pt", "DN": "/data/dn", "EPOCHS": "7"},
     {"--ckpt_path": "logs/x/epoch_32.pt", "--l1_coeff": "1e-4",
      "--train_sae_bs": "4096", "--expansion_factor": "4", "--num_epochs": "7"}),
    ("subsample-domainnet.sh",
     {"DN": "/data/dn"},
     {"--domainnet_path": "/data/dn", "--indices_path": "data/indices"}),
]


@pytest.mark.parametrize("script,env,expected",
                         OTHER_LAUNCHERS, ids=[s for s, _, _ in OTHER_LAUNCHERS])
def test_other_launchers_flag_surface(tmp_path, script, env, expected):
    """Each remaining launcher invokes its entry point with the reference's
    flag surface (slurm/*.sh equivalents)."""
    bin_dir = tmp_path / "bin"
    bin_dir.mkdir(exist_ok=True)
    args_out = tmp_path / "argv.txt"
    stub = bin_dir / "python"
    stub.write_text(f'#!/bin/bash\necho "$@" >> "{args_out}"\n')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "launchers", script)], cwd=tmp_path,
        env=dict(os.environ, PATH=f"{bin_dir}:{os.environ['PATH']}", **env),
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    invocations = [line.split() for line in args_out.read_text().splitlines()]
    assert invocations
    for flag, value in expected.items():
        assert any(_flag(argv, flag) == value for argv in invocations), (flag, invocations)
    if script == "subsample-domainnet.sh":
        # 5 domains x 3 mixture variants + real-only (reference grid)
        assert len(invocations) == 16
        assert sum("--real_only" in argv for argv in invocations) == 1
        assert sum("--single_domain" in argv for argv in invocations) == 5
