"""Sweep orchestrator tests: scheduling, pinning env, retry logic.

The heavy per-sequence payload is replaced with trivial commands; the
end-to-end predict path itself is covered by tests/test_e2e_pipeline.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "script"))

import predict_mupots_sweep as sweep  # noqa: E402


def test_build_commands_shape():
    cmds = sweep.build_commands([1, 7], "cfg.yml", "/out",
                                ["--num_iter", "5"])
    assert len(cmds) == 2
    assert "--ts_id" in cmds[0] and "1" in cmds[0]
    assert cmds[1][cmds[1].index("--ts_id") + 1] == "7"
    assert cmds[0][-2:] == ["--num_iter", "5"]


def test_worker_env_pins_one_chip():
    env = sweep.worker_env(3, platform="tpu")
    assert env["TPU_VISIBLE_DEVICES"] == "3"
    env = sweep.worker_env(0, platform="cpu")
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "JAX_COMPILATION_CACHE_DIR" in env


def test_run_sweep_schedules_all_jobs(tmp_path):
    marker = tmp_path / "done"
    cmds = [[sys.executable, "-c",
             f"open(r'{marker}_{i}', 'w').write('x')"]
            for i in range(5)]
    res = sweep.run_sweep(cmds, workers=2, platform="cpu",
                          labels=[f"TS{i}" for i in range(5)])
    assert res == {f"TS{i}": 0 for i in range(5)}
    for i in range(5):
        assert os.path.exists(f"{marker}_{i}")


def test_run_sweep_reports_failures_and_retries(tmp_path):
    # first attempt fails, the retry succeeds (file-existence toggle)
    flag = tmp_path / "flag"
    toggle = (f"import os,sys; p=r'{flag}'; "
              "sys.exit(0) if os.path.exists(p) else "
              "(open(p,'w').close(), sys.exit(3))")
    res = sweep.run_sweep(
        [[sys.executable, "-c", toggle],
         [sys.executable, "-c", "import sys; sys.exit(2)"]],
        workers=1, platform="cpu", retries=1, labels=["a", "b"])
    assert res["a"] == 0          # retry healed it
    assert res["b"] == 2          # persistent failure reported
