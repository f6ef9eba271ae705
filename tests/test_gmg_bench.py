"""Smoke test of the GMG microbenchmark (the reference's `gmg` binary)."""

from dealii_spirk_tpu.gmg_bench import main


def test_gmg_bench_2d(capsys):
    rc = main(["--dim", "2", "--min-ref", "3", "--max-ref", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "t_per_it_scalar" in out
    assert "t_per_it_batched8" in out
    # iteration counts mesh-independent and small
    import json

    rows = [json.loads(l) for l in out.splitlines() if l.startswith("{")]
    assert all(r["it_scalar"] <= 15 for r in rows)
