"""Per-sample evaluation figures.

Capability parity with reference test/evaluate.py:363-443
(plot_evaluation_results): input DW map + RGB, per-channel GT / prediction /
error map with shared color scales, and a per-DW-class MAE bar chart.
"""

from __future__ import annotations

import os

import numpy as np

from maunet_tpu.data.schema import NormalizationStats
from maunet_tpu.utils.dw import dw_to_rgb, get_dw_legend_patches


def plot_evaluation_sample(
    maps_hwc: np.ndarray,
    gt_unnorm: np.ndarray,
    pred_unnorm: np.ndarray,
    metrics_df,
    channels: list[str],
    stats: NormalizationStats | None,
    sample_info: dict,
    study_name: str,
    trial_id,
    sample_idx: int,
    out_dir: str,
) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)

    dw_rgb = dw_to_rgb(np.argmax(maps_hwc[..., :9], axis=-1))
    rgb = maps_hwc[..., 9:12]
    if stats is not None:
        rgb = (rgb * np.array(stats.rgb_std) + np.array(stats.rgb_mean)) * 255.0
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    else:
        rgb = np.clip(rgb, 0, 1)

    city = sample_info.get("city", "?")
    fig = plt.figure(figsize=(24, 18))
    fig.suptitle(f"Evaluation - {city} ({sample_info.get('lat')}, "
                 f"{sample_info.get('lon')})\nSample {sample_idx} "
                 f"(Trial {trial_id})", fontsize=20)
    gs = fig.add_gridspec(3, max(2, len(channels) * 2))

    ax = fig.add_subplot(gs[0, 0])
    ax.imshow(dw_rgb); ax.set_title("Input DW (t1)"); ax.axis("off")
    ax.legend(handles=get_dw_legend_patches(), bbox_to_anchor=(1.05, 1),
              loc="upper left", borderaxespad=0.0)
    ax = fig.add_subplot(gs[0, 1])
    ax.imshow(rgb); ax.set_title("Input RGB (t1)"); ax.axis("off")

    for i, ch_name in enumerate(channels):
        gt, pred = gt_unnorm[..., i], pred_unnorm[..., i]
        error = pred - gt
        vmin, vmax = min(gt.min(), pred.min()), max(gt.max(), pred.max())
        emax = np.max(np.abs(error))
        for col, (img, title, kw) in enumerate([
            (gt, f"GT: {ch_name}", dict(cmap="viridis", vmin=vmin, vmax=vmax)),
            (pred, f"Pred: {ch_name}", dict(cmap="viridis", vmin=vmin, vmax=vmax)),
        ]):
            ax = fig.add_subplot(gs[1, i * 2 + col])
            im = ax.imshow(img, **kw)
            ax.set_title(title); ax.axis("off")
            plt.colorbar(im, ax=ax, orientation="horizontal", pad=0.05)
        ax = fig.add_subplot(gs[2, i * 2])
        im = ax.imshow(error, cmap="coolwarm", vmin=-emax, vmax=emax)
        ax.set_title("Error (Pred - GT)"); ax.axis("off")
        plt.colorbar(im, ax=ax, orientation="horizontal", pad=0.05)

        ax = fig.add_subplot(gs[2, i * 2 + 1])
        cm = metrics_df[(metrics_df["channel"] == ch_name)
                        & (metrics_df["dw_class"] != "overall")]
        if not cm.empty:
            cm.set_index("dw_class")["mae"].plot(kind="bar", ax=ax)
        ax.set_title("MAE per DW Class"); ax.set_ylabel("MAE")
        ax.tick_params(axis="x", rotation=45)

    fig.tight_layout(rect=[0, 0, 1, 0.96])
    path = os.path.join(out_dir,
                        f"{study_name}_trial_{trial_id}_sample_{city}_{sample_idx}.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
