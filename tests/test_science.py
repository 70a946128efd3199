"""Planted-signal fixture + ablation science loop (VERDICT r2 next #3).

The full-scale run (192 tiles, 6 epochs, 828-month series) executes on the
real chip via ``python -m maunet_tpu.analysis.science``; these tests prove
the machinery on CPU at miniature sizes.
"""

import glob
import json
import os

import numpy as np
import pandas as pd

from maunet_tpu.data.dataset import NpzDataset
from maunet_tpu.data.synthetic import generate_dataset


def test_planted_signals_are_in_the_target(tmp_path):
    """The LST target must carry a latitude- and series-dependent offset the
    spatial input cannot explain; NDVI stays untouched."""
    root = generate_dataset(str(tmp_path / "planted"), {"train": 48},
                            hw=16, temporal_len=64, meta_signal=1.0,
                            temporal_signal=0.5)
    base = generate_dataset(str(tmp_path / "plain"), {"train": 48},
                            hw=16, temporal_len=64)

    def collect(root):
        ds = NpzDataset(f"{root}/train", temporal_length=64)
        lat, recent, lst, ndvi = [], [], [], []
        for i in range(len(ds)):
            s = ds[i]
            lat.append(float(s["metadata"][0]))
            n = int(s["temp_lengths"])
            recent.append(float(s["temp_series"][max(0, n - 12):n].mean()))
            lst.append(float(s["targets"][..., 1].mean()))
            ndvi.append(float(s["targets"][..., 0].mean()))
        return map(np.asarray, (lat, recent, lst, ndvi))

    lat_p, rec_p, lst_p, ndvi_p = collect(root)
    lat_0, rec_0, lst_0, ndvi_0 = collect(base)

    # planted: mean LST strongly explained by lat + recent series mean
    pred = 1.0 * lat_p + 0.5 * rec_p
    r = np.corrcoef(pred, lst_p)[0, 1]
    assert r > 0.9, f"planted signal too weak, r={r:.3f}"
    # unplanted: no such dependence
    r0 = np.corrcoef(1.0 * lat_0 + 0.5 * rec_0, lst_0)[0, 1]
    assert abs(r0) < 0.5, f"plain dataset unexpectedly correlated, r={r0:.3f}"
    # NDVI untouched in both (identical generator stream up to the offset)
    assert np.allclose(ndvi_p, ndvi_0, atol=1e-6)


def test_science_loop_smoke(tmp_path):
    """Miniature end-to-end ablation loop: 4 variants train, evaluate, pass
    through stats + sensitivity + comparison, and the artifacts land."""
    from maunet_tpu.analysis.science import run_science_loop

    work = str(tmp_path / "science")
    summary = run_science_loop(
        work_dir=work, hw=32, temporal_len=32, base_filters=4,
        batch_size=4, epochs=2,
        samples={"train": 16, "val": 4, "test": 8},
        meta_signal=1.0, temporal_signal=0.5)

    assert set(summary["variants"]) == {"noemb", "tempemb", "metaemb", "emb"}
    for row in summary["variants"].values():
        assert np.isfinite(row["lst_mae_c"]) and np.isfinite(row["ndvi_mae"])
    assert len(summary["lst_mae_ranking"]) == 4
    # artifacts: evaluation CSVs, t-tests, nonparametric, sensitivity JSONs,
    # comparison plots, report
    assert len(glob.glob(f"{work}/tests/*_evaluation.csv")) == 4
    assert os.path.exists(f"{work}/comparative_ttests.csv")
    assert os.path.exists(f"{work}/nonparametric_tests.csv")
    assert len(glob.glob(f"{work}/sensitivity/sensitivity_data_*.json")) >= 3
    assert glob.glob(f"{work}/sensitivity/comparison/*")
    assert os.path.exists(f"{work}/summary.json")
    report = open(f"{work}/REPORT.md").read()
    assert "LST MAE" in report and "noemb" in report
    assert "Temporal sweep" in report
    sens = summary["sensitivity"]
    for key in ("emb_lat_response", "noemb_lat_response", "gt_lat_response"):
        assert np.isfinite(sens[key]["slope_per_degree"])
    # temporal sweep (round 4): artifacts + finite slopes for both the
    # tempemb model and the temporal-blind noemb control
    assert len(glob.glob(
        f"{work}/sensitivity/sensitivity_data_temporal_*.json")) == 2
    for key in ("tempemb_temporal_response", "noemb_temporal_response"):
        assert np.isfinite(sens[key]["slope_per_zunit"])
    assert sens["expected_temporal_slope_c_per_zunit"] > 0
    # 2 epochs on 16 tiles is not enough to assert model quality here; the
    # full-scale planted-signal assertions run on the chip (docs/SCIENCE.md).
    ttests = pd.read_csv(f"{work}/comparative_ttests.csv")
    assert {"model_1", "model_2", "winner"} <= set(ttests.columns)


def test_committed_science_outcomes():
    """The committed full-scale chip run (reports/science/summary.json) must
    show the headline scientific claims — a CI tripwire so a regression that
    silently breaks the embeddings' benefit cannot land with stale artifacts
    (VERDICT r3 next #2).  A re-run that weakens any claim fails here and
    forces the claim (or the recipe) to be revisited explicitly.

    Counterpart of the reference's headline result (metaemb 5.33 vs noemb
    7.11 °C LST MAE, reports/tests/app/metrics_results/all_all.csv) and of
    test/statistical_tests.py:91-168's paired t-test protocol.
    """
    path = os.path.join(os.path.dirname(__file__), "..",
                        "reports", "science", "summary.json")
    s = json.load(open(path))

    # every embedding channel beats noemb on LST MAE...
    v = s["variants"]
    for name in ("metaemb", "tempemb", "emb"):
        assert v[name]["lst_mae_c"] < v["noemb"]["lst_mae_c"], name
    assert s["lst_mae_ranking"][-1] == "noemb"
    # ...with statistically significant paired-t wins (p<0.05 bins)
    wins = s["significant_lst_wins_over_noemb"]
    for name in ("metaemb", "tempemb", "emb"):
        assert wins[name] > 0, f"{name} lost significance: {wins}"

    # the sweeps recover the planted signals; the blind controls read flat
    sens = s["sensitivity"]
    assert sens["emb_lat_response"]["pearson_r"] > 0.9
    assert abs(sens["noemb_lat_response"]["pearson_r"]) < 0.3
    assert sens["tempemb_temporal_response"]["pearson_r"] > 0.9
    assert abs(sens["noemb_temporal_response"]["pearson_r"]) < 0.3
    # recovered temporal slope has the planted sign and >=50% magnitude
    expected = sens["expected_temporal_slope_c_per_zunit"]
    got = sens["tempemb_temporal_response"]["slope_per_zunit"]
    assert got > 0.5 * expected, (got, expected)
    # latitude slope sign matches the ground-truth binning
    assert (sens["emb_lat_response"]["slope_per_degree"]
            * sens["gt_lat_response"]["slope_per_degree"]) > 0
