"""ICI scaling harness: mechanics smoke on the 8-device virtual CPU mesh.

The harness itself is the deliverable for the environment-blocked
"validate ICI scaling on real multi-chip hardware" roadmap item — these
tests prove the sharded chained measurement runs end-to-end on every mesh
shape it will use on a real slice (numbers on an oversubscribed CPU mesh
are meaningless and are not asserted on).
"""

import json
import math

import pytest

from benchmarks import ici_scaling


@pytest.mark.slow  # full virtual-mesh DP sweep + TP points (~3 min cold)
def test_run_covers_dp_sweep_and_tp_points(tmp_path):
    out = tmp_path / "ici.json"
    results = ici_scaling.run(2, tiny=True, reps=1, out_path=str(out))
    shapes = [(c["n_data"], c["n_model"]) for c in results["configs"]]
    assert shapes == [(1, 1), (2, 1), (1, 2)]
    for c in results["configs"]:
        assert c["global_B"] == 2 * c["n_data"]
        assert math.isfinite(c["step_ms"])
        assert c["efficiency"] is not None
    # the 1-chip sweep point is the efficiency anchor by construction
    assert results["configs"][0]["efficiency"] == 1.0
    # incremental artifact on disk matches the return value
    on_disk = json.loads(out.read_text())
    assert on_disk["configs"] == results["configs"]
    assert "differencing" in on_disk["protocol"]
