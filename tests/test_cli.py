"""CLI smoke tests on the CPU test platform (the reference's dispatcher
semantics, main.cu:66-226, exercised end to end through argparse)."""

import numpy as np
import pytest

from qtesla_tpu import cli


def test_info(capsys):
    assert cli.main(["info"]) == 0
    out = capsys.readouterr().out
    assert "qtesla-iii-speed" in out and "backend:" in out


def test_correctness_ramp_fixture(capsys):
    assert cli.main(["correctness", "--param-set", "smallprime",
                     "--algo", "merged,gs_ct"]) == 0
    out = capsys.readouterr().out
    # 2 algos x (oracle check + all-ones closed form)
    assert out.count("Identical.") == 4


def test_correctness_random(capsys):
    assert cli.main(["correctness", "--param-set", "smallprime",
                     "--algo", "stockham", "--random", "-r", "7"]) == 0
    assert "Identical." in capsys.readouterr().out


def test_correctness_all_skips_pallas_on_cpu(capsys):
    assert cli.main(["correctness", "--param-set", "smallprime",
                     "--algo", "all"]) == 0
    out = capsys.readouterr().out
    assert "merged" in out and "nussbaumer" in out
    assert "mxu" not in out                   # Pallas algos skipped on CPU


def test_speed_json(capsys):
    assert cli.main(["speed", "--param-set", "smallprime", "--algo",
                     "merged", "--batch", "64", "--iters", "3",
                     "--json"]) == 0
    out = capsys.readouterr().out
    assert "polymuls_per_s" in out


def test_speed_fixed(capsys):
    assert cli.main(["speed", "--param-set", "smallprime", "--algo",
                     "merged", "--batch", "64", "--iters", "3",
                     "--fixed"]) == 0
    assert "polymul_fixed" in capsys.readouterr().out


def test_scaling_dp(capsys):
    assert cli.main(["scaling", "--param-set", "smallprime",
                     "--batch-per-device", "32", "--iters", "2"]) == 0
    out = capsys.readouterr().out
    assert "scaling-eff" in out


def test_microbench(capsys):
    assert cli.main(["microbench", "--param-set", "smallprime",
                     "--size", "65536", "--iters", "3"]) == 0
    assert "barrett" in capsys.readouterr().out


def test_unknown_algo_rejected():
    with pytest.raises(SystemExit):
        cli.main(["speed", "--algo", "nope"])
