"""CLI surface tests: every subcommand runs end-to-end on the CPU test
platform (tiny MacKay configs), exercising the same entry points a user
migrating from the reference's main_Base/main_Post scripts would."""

import json
import os

import numpy as np
import pytest

from ldpc_error_floor_tpu.cli import main
from ldpc_error_floor_tpu.pipelines import ExperimentConfig


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    td = str(tmp_path_factory.mktemp("cli"))
    cfg = ExperimentConfig(
        code="MACKAY_N96_K48", sharing=(3, 0, 3), decoding_type=1,
        iters_max=3, iter_step=3, loss_type=0, opt_metric=2,
        batch_size=32, training_num=64, epochs=1,
        valid_flag=1, valid_num=64, snrs=[2.0, 3.0],
        out_dir=os.path.join(td, "Weights"), seed=4)
    cfg.to_json(os.path.join(td, "cfg.json"))
    return td, cfg


def test_cli_codes_weights(capsys):
    assert main(["codes"]) == 0
    out = capsys.readouterr().out
    assert "wman_N0576_R34_z24" in out and "MACKAY_N96_K48" in out
    assert main(["weights"]) == 0
    assert "iter50" in capsys.readouterr().out


def test_cli_train_then_evaluate(workdir, capsys):
    td, cfg = workdir
    assert main(["train", "--config", os.path.join(td, "cfg.json")]) == 0
    opt = os.path.join(td, "Weights",
                       "C0_MACKAY_N96_K48_Opt_Weight_End3.txt")
    assert os.path.exists(opt)
    capsys.readouterr()
    assert main(["evaluate", "--config", os.path.join(td, "cfg.json"),
                 "--batch", "32", "--frames", "64"]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert [l["snr"] for l in lines] == [2.0, 3.0]
    assert all(np.isfinite(l["fer"]) for l in lines)


def test_cli_collect_split_analyze(workdir, capsys):
    td, cfg = workdir
    uncor = os.path.join(td, "Uncor.txt")
    import dataclasses
    ccfg = dataclasses.replace(cfg, snrs=[2.0], sampling_type=2)
    ccfg.to_json(os.path.join(td, "collect_cfg.json"))
    assert main(["collect", "--config", os.path.join(td, "collect_cfg.json"),
                 "--words", "24", "--batch", "64", "--out", uncor]) == 0
    capsys.readouterr()
    assert main(["analyze-uncor", "--uncor", uncor,
                 "--code", "MACKAY_N96_K48",
                 "--weights", os.path.join(
                     td, "Weights", "C0_MACKAY_N96_K48_Opt_Weight_End3.txt"),
                 "--sharing", "3", "0", "3", "--iters", "3",
                 "--decoding-type", "1", "--batch", "8"]) == 0
    out = capsys.readouterr().out
    assert "still failing" in out and "(a=wrong bits" in out
    assert main(["split-uncor", "--uncor", uncor,
                 "--code", "MACKAY_N96_K48", "--input-dir",
                 os.path.join(td, "Inputs"),
                 "--train", "8", "--valid", "8", "--test", "8"]) == 0
    assert os.path.exists(
        os.path.join(td, "Inputs", "[Uncor]_MACKAY_N96_K48_Test.txt"))


def test_cli_evaluate_small_split_clamps_batch(workdir, capsys):
    """A harvested split smaller than --batch must still evaluate (the
    effective batch clamps to the split size; ADVICE r2)."""
    td, cfg = workdir
    import dataclasses
    ecfg = dataclasses.replace(cfg, sampling_type=1, snrs=[2.0],
                               input_dir=os.path.join(td, "Inputs"),
                               valid_num=8, test_num=8)
    ecfg.to_json(os.path.join(td, "eval_cfg.json"))
    assert main(["evaluate", "--config", os.path.join(td, "eval_cfg.json"),
                 "--batch", "32",
                 "--weights", os.path.join(
                     td, "Weights",
                     "C0_MACKAY_N96_K48_Opt_Weight_End3.txt")]) == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    assert {l["split"] for l in lines} == {"valid", "test"}
    assert all(l["rows_used"] == 8 for l in lines)
    assert all(np.isfinite(l["fer"]) for l in lines)


def test_cli_simulate_and_mesh(workdir, capsys):
    td, cfg = workdir
    assert main(["simulate", "--code", "MACKAY_N96_K48",
                 "--sharing", "3", "0", "3", "--iters", "3",
                 "--decoding-type", "1", "--snrs", "2.0",
                 "--batch", "64", "--backend", "xla",
                 "--max-frames", "128", "--target-errors", "1000"]) == 0
    pt = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pt["frames"] == 128 and pt["fer_genie"] > 0
    # mesh path over the 8 virtual devices
    assert main(["simulate", "--code", "MACKAY_N96_K48",
                 "--sharing", "3", "0", "3", "--iters", "3",
                 "--decoding-type", "1", "--snrs", "2.0",
                 "--batch", "64", "--backend", "xla", "--mesh",
                 "--max-frames", "128", "--target-errors", "1000"]) == 0
    pt2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert pt2["frames"] == 128 and pt2["fer_genie"] > 0


def test_cli_convert_weights_roundtrip(workdir, capsys, tmp_path):
    td, cfg = workdir
    src = os.path.join(td, "Weights", "C0_MACKAY_N96_K48_Opt_Weight_End3.txt")
    js = str(tmp_path / "w.json")
    txt = str(tmp_path / "w.txt")
    assert main(["convert-weights", "--src", src, "--out", js]) == 0
    assert main(["convert-weights", "--src", js, "--out", txt]) == 0
    assert open(src).read() == open(txt).read()


def test_cli_init_config(tmp_path, capsys):
    out = str(tmp_path / "c.json")
    assert main(["init-config", "--out", out]) == 0
    cfg = ExperimentConfig.from_json(out)
    assert cfg.code == "wman_N0576_R34_z24" and cfg.epochs == 200
    assert main(["init-config", "--post", "--out", out]) == 0
    cfg = ExperimentConfig.from_json(out)
    assert cfg.sampling_type == 1 and cfg.fixed_iter == 20
