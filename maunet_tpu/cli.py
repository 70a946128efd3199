"""Command-line interface.

One argparse program replaces the reference's scattered Typer entry points
(src/train.py:62, test/evaluate.py:44, test/metadata_sensitivity.py:41,
test/statistical_tests.py:171, …):

    python -m maunet_tpu.cli train --model-type unet --study-name s ...
    python -m maunet_tpu.cli evaluate CKPT [--data-dir ...]
    python -m maunet_tpu.cli synth-data OUT_DIR [--hw 64 ...]
    python -m maunet_tpu.cli sensitivity CKPT EVAL_CSV ...
    python -m maunet_tpu.cli gt-sensitivity ...
    python -m maunet_tpu.cli compare-sensitivity DIR
    python -m maunet_tpu.cli stats CSV [CSV2 ...]
    python -m maunet_tpu.cli eda {visualize,extract,analyze-csv} ...
"""

from __future__ import annotations

import argparse
import os
import sys

from maunet_tpu.config import Config, load_config
from maunet_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _load_cfg(args) -> Config:
    overrides = {}
    for item in getattr(args, "override", None) or []:
        key, _, value = item.partition("=")
        import ast

        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        overrides[key] = value
    return load_config(getattr(args, "config", None), overrides)


def cmd_train(args) -> int:
    cfg = _load_cfg(args)
    cfg = cfg.with_overrides(**{
        "training.model_type": args.model_type,
        "training.temporal_embeddings": args.temporal_embeddings,
        "training.metadata_embeddings": args.metadata_embeddings,
    })
    study_name = args.study_name
    if not args.force_study_name:
        from maunet_tpu.utils.tracking import make_emb_tag

        study_name += "-" + make_emb_tag(args.temporal_embeddings,
                                         args.metadata_embeddings)

    from maunet_tpu.train.hpo import TrialPruned, create_study
    from maunet_tpu.train.loop import Trainer
    from maunet_tpu.utils.tracking import WandbTracker, make_emb_tag

    seeds = args.seeds or [cfg.seed]
    for seed in seeds:
        seed_cfg = cfg.with_overrides(seed=int(seed))
        seed_study = study_name if len(seeds) == 1 else f"{study_name}-seed{seed}"
        study = create_study(seed_study, storage_dir=f"{args.work_dir}_hpo")

        def objective(trial, seed_cfg=seed_cfg, seed_study=seed_study):
            if args.search:
                from maunet_tpu.train.hpo import suggest_training_params

                seed_cfg = seed_cfg.with_overrides(
                    **suggest_training_params(trial))
                log.info(f"Trial {trial.number} params: {trial.params}")
            trackers = []
            if args.wandb:
                trackers.append(WandbTracker(
                    project=os.getenv("WANDB_PROJECT"),
                    group=seed_study,
                    name=f"trial-{trial.number}-{make_emb_tag(args.temporal_embeddings, args.metadata_embeddings)}",
                    config=seed_cfg.to_dict(),
                    tags=[seed_study, args.model_type,
                          f"loss_{seed_cfg.training.loss}"]))
            trainer = Trainer(seed_cfg, data_dir=args.data_dir,
                              work_dir=args.work_dir, study_name=seed_study,
                              trial_id=trial.number, trackers=trackers)

            def on_epoch(epoch, val_loss):
                trial.report(val_loss, epoch)
                if trial.should_prune():
                    raise TrialPruned()

            try:
                result = trainer.train(epochs=args.epochs,
                                       epoch_callback=on_epoch,
                                       resume=args.resume)
            finally:
                for tr in trackers:
                    tr.finish()
            return result.best_val_loss

        study.optimize(objective, n_trials=args.n_trials)
        best = study.best_trial
        log.info(f"Study {seed_study} finished. Best trial: {best.number} "
                 f"(min val_loss {best.value:.4f})")
    return 0


def cmd_evaluate(args) -> int:
    cfg = _load_cfg(args)
    from maunet_tpu.evaluate.evaluator import evaluate_checkpoint

    evaluate_checkpoint(
        args.checkpoint_path, cfg, data_dir=args.data_dir,
        study_name=args.study_name, jobid=args.jobid,
        n_visualize=args.n_visualize, output_dir=args.output_dir,
        batch_size=args.batch_size, precision=args.precision,
        use_mesh=args.use_mesh)
    return 0


def cmd_synth_data(args) -> int:
    from maunet_tpu.data.synthetic import generate_dataset

    splits = {"train": args.train, "val": args.val, "test": args.test}
    root = generate_dataset(args.out_dir, splits, hw=args.hw,
                            temporal_len=args.temporal_len, seed=args.seed)
    log.success(f"Synthetic dataset written to {root}")
    return 0


def cmd_bench(args) -> int:
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.main()
    return 0


def cmd_pack(args) -> int:
    cfg = _load_cfg(args)
    from maunet_tpu.data.shards import pack_dataset

    for split in args.splits:
        src = f"{args.data_dir}/{split}"
        out = f"{args.out_dir or args.data_dir + '_packed'}/{split}"
        pack_dataset(src, out, shard_size=args.shard_size,
                     temporal_length=cfg.dataset.temporal_length)
    import shutil

    stats = f"{args.data_dir}/normalization_metrics.json"
    if os.path.exists(stats):
        shutil.copy(stats, f"{args.out_dir or args.data_dir + '_packed'}/"
                           "normalization_metrics.json")
    return 0


def cmd_export_torch(args) -> int:
    """Orbax checkpoint dir → reference-format .pth, optionally with the
    optimizer state converted for torch training resume."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maunet_tpu.interop.torch_export import export_torch_checkpoint
    from maunet_tpu.models.factory import build_model
    from maunet_tpu.train.checkpoint import (
        load_metadata,
        restore_checkpoint,
        restore_variables,
    )
    from maunet_tpu.train.state import create_train_state

    meta = load_metadata(args.checkpoint_dir)
    hp = dict(meta.get("hyperparameters", {}))
    hp.setdefault("lr", hp.get("learning_rate", 1e-4))

    opt_state = None
    if args.with_optimizer:
        from maunet_tpu.train.optimizers import make_optimizer

        # Rebuild the exact model+optimizer structure the checkpoint was
        # saved with, restore the full TrainState, then convert.
        model = build_model(hp, compute_dtype=jnp.float32)
        example = {
            "maps": np.zeros((1, 32, 32, 23), np.float32),
            "temp_series": np.zeros((1, 16), np.float32),
            "metadata": np.zeros((1, 4), np.float32),
            "t1_dates": np.zeros((1, 2), np.float32),
            "t2_dates": np.zeros((1, 2), np.float32),
            "temp_lengths": np.full((1,), 16, np.int32),
        }
        tx = make_optimizer(
            hp.get("optimizer", "adamw"),
            learning_rate=float(hp.get("learning_rate", 1e-4)),
            weight_decay=float(hp.get("weight_decay", 0.0)),
            momentum=float(hp.get("momentum", 0.9)),
            gradient_clipping=float(hp.get("gradient_clipping", 0.0)))
        example_state = create_train_state(
            model, tx, jax.random.PRNGKey(0), example,
            metadata_features=int(meta.get("metadata_input_length", 8)))
        state, _ = restore_checkpoint(args.checkpoint_dir, example_state)
        variables, opt_state = state.variables, jax.device_get(state.opt_state)
        variables = jax.device_get(variables)
    else:
        variables, _ = restore_variables(args.checkpoint_dir)

    out = export_torch_checkpoint(
        args.out_path, variables, hp, opt_state=opt_state,
        metadata_input_length=meta.get("metadata_input_length", 8),
        study_name=meta.get("study_name", ""),
        trial_id=meta.get("trial_id", 0),
        epoch=meta.get("epoch", 0), loss=meta.get("loss"))
    log.success(f"Exported {out}"
                + (" (with optimizer state)" if opt_state is not None else ""))
    return 0


def cmd_process(args) -> int:
    cfg = _load_cfg(args)
    from maunet_tpu.data.processing import process_future_data

    process_future_data(cfg, image_dir=args.image_dir,
                        output_dir=args.output_dir,
                        cities_csv=args.cities_csv)
    return 0


def cmd_acquire(args) -> int:
    cfg = _load_cfg(args)
    from maunet_tpu.data.acquisition import run_acquisition

    run_acquisition(cfg, raw_cities_csv=args.cities_csv,
                    n_workers=args.workers)
    return 0


def cmd_process_temperature(args) -> int:
    cfg = _load_cfg(args)
    from maunet_tpu.data.temperature import process_temperature

    process_temperature(args.raw_dir or cfg.paths.raw_temperature_dir,
                        args.out_dir or cfg.paths.processed_temperature_dir)
    return 0


def cmd_sensitivity(args) -> int:
    cfg = _load_cfg(args)
    from maunet_tpu.analysis.sensitivity import run_sensitivity

    run_sensitivity(args.checkpoint_path, args.eval_csv, cfg,
                    data_dir=args.data_dir, output_dir=args.output_dir,
                    max_samples=args.max_samples)
    return 0


def cmd_gt_sensitivity(args) -> int:
    cfg = _load_cfg(args)
    from maunet_tpu.analysis.gt_sensitivity import run_gt_sensitivity

    run_gt_sensitivity(cfg, data_dir=args.data_dir, output_dir=args.output_dir)
    return 0


def cmd_compare_sensitivity(args) -> int:
    from maunet_tpu.analysis.compare import compare_sensitivity

    compare_sensitivity(args.data_dir, output_dir=args.output_dir)
    return 0


def cmd_stats(args) -> int:
    from maunet_tpu.analysis.stats import comparative_analysis, interpret_metrics

    if len(args.csvs) == 1:
        interpret_metrics(args.csvs[0], output_dir=args.output_dir)
    else:
        comparative_analysis(args.csvs, output_dir=args.output_dir)
    return 0


def cmd_export_optuna(args) -> int:
    from maunet_tpu.train.optuna_storage import export_study_to_sqlite

    export_study_to_sqlite(args.json_path, args.db_path)
    return 0


def cmd_import_optuna(args) -> int:
    from maunet_tpu.train.optuna_storage import import_study_from_sqlite

    import_study_from_sqlite(args.db_path, args.json_path,
                             study_name=args.study_name)
    return 0


def cmd_science(args) -> int:
    from maunet_tpu.analysis.science import run_science_loop

    run_science_loop(work_dir=args.work_dir, hw=args.hw, epochs=args.epochs)
    return 0


def cmd_eda(args) -> int:
    from maunet_tpu.analysis import eda

    if args.eda_command == "extract":
        eda.extract_metrics_csv(args.data_dir, args.out_csv)
    elif args.eda_command == "visualize":
        eda.visualize_sample(args.npz_path, out_path=args.out)
    elif args.eda_command == "analyze-csv":
        eda.analyze_csv(args.csv_path)
    elif args.eda_command == "visualize-tiles":
        from maunet_tpu.analysis.tile_viz import visualize_raw_tiles

        visualize_raw_tiles(args.image_dir, out_path=args.out)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="maunet", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--config", default=None, help="YAML config path")
        sp.add_argument("-o", "--override", action="append",
                        help="dotted config override key=value")

    sp = sub.add_parser("train", help="train a model (HPO study)")
    common(sp)
    sp.add_argument("--model-type", default="unet", choices=["unet", "unet++"])
    sp.add_argument("--study-name", default="urban-predictor")
    sp.add_argument("--force-study-name", action="store_true")
    sp.add_argument("--temporal-embeddings", action=argparse.BooleanOptionalAction,
                    default=True)
    sp.add_argument("--metadata-embeddings", action=argparse.BooleanOptionalAction,
                    default=True)
    sp.add_argument("--n-trials", type=int, default=1)
    sp.add_argument("--search", action="store_true",
                    help="enable the default hyperparameter search space "
                         "(lr, weight_decay, optimizer; TPE-lite sampler)")
    sp.add_argument("--epochs", type=int, default=None)
    sp.add_argument("--data-dir", default=None)
    sp.add_argument("--work-dir", default="reports/training")
    sp.add_argument("--resume", action="store_true",
                    help="resume each trial from its last full-state checkpoint")
    sp.add_argument("--seeds", nargs="+", type=int, default=None,
                    help="cross-validation seeds (one study per seed; "
                         "reference conf seeds_cv)")
    sp.add_argument("--wandb", action="store_true",
                    help="log to Weights & Biases if installed")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("evaluate", help="evaluate a checkpoint on the test split")
    common(sp)
    sp.add_argument("checkpoint_path")
    sp.add_argument("--data-dir", default=None)
    sp.add_argument("--study-name", default="test")
    sp.add_argument("--jobid", default="")
    sp.add_argument("--n-visualize", type=int, default=10)
    sp.add_argument("--batch-size", type=int, default=None)
    sp.add_argument("--output-dir", default="reports/tests")
    sp.add_argument("--precision", default="bfloat16",
                    choices=["bfloat16", "float32"],
                    help="float32 for exact parity with reference numbers")
    sp.add_argument("--use-mesh", action="store_true",
                    help="run the eval hot loop data-parallel over all "
                         "visible devices (shard_map; Pallas path included)")
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("synth-data", help="generate a synthetic dataset")
    sp.add_argument("out_dir")
    sp.add_argument("--train", type=int, default=64)
    sp.add_argument("--val", type=int, default=16)
    sp.add_argument("--test", type=int, default=16)
    sp.add_argument("--hw", type=int, default=256)
    sp.add_argument("--temporal-len", type=int, default=828)
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_synth_data)

    sp = sub.add_parser("bench", help="run the benchmark")
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("pack", help="pack per-sample .npz splits into shards")
    common(sp)
    sp.add_argument("data_dir")
    sp.add_argument("--out-dir", default=None)
    sp.add_argument("--splits", nargs="+", default=["train", "val", "test"])
    sp.add_argument("--shard-size", type=int, default=64)
    sp.set_defaults(fn=cmd_pack)

    sp = sub.add_parser("export-torch",
                        help="orbax checkpoint → reference-format .pth")
    sp.add_argument("checkpoint_dir")
    sp.add_argument("out_path")
    sp.add_argument("--with-optimizer", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="embed optimizer_state_dict for torch training resume")
    sp.set_defaults(fn=cmd_export_torch)

    sp = sub.add_parser("process", help="raw tiles → processed .npz dataset")
    common(sp)
    sp.add_argument("--image-dir", default=None)
    sp.add_argument("--output-dir", default=None)
    sp.add_argument("--cities-csv", default=None)
    sp.set_defaults(fn=cmd_process)

    sp = sub.add_parser("acquire", help="GEE batch download (needs ee/geemap)")
    common(sp)
    sp.add_argument("--cities-csv", default=None)
    sp.add_argument("--workers", type=int, default=8)
    sp.set_defaults(fn=cmd_acquire)

    sp = sub.add_parser("process-temperature", help="CRU z-scoring → cube")
    common(sp)
    sp.add_argument("--raw-dir", default=None)
    sp.add_argument("--out-dir", default=None)
    sp.set_defaults(fn=cmd_process_temperature)

    sp = sub.add_parser("sensitivity", help="metadata sensitivity sweep")
    common(sp)
    sp.add_argument("checkpoint_path")
    sp.add_argument("eval_csv")
    sp.add_argument("--data-dir", default=None)
    sp.add_argument("--output-dir", default="reports/sensitivity")
    sp.add_argument("--max-samples", type=int, default=1000)
    sp.set_defaults(fn=cmd_sensitivity)

    sp = sub.add_parser("gt-sensitivity", help="ground-truth sensitivity binning")
    common(sp)
    sp.add_argument("--data-dir", default=None)
    sp.add_argument("--output-dir", default="reports/sensitivity")
    sp.set_defaults(fn=cmd_gt_sensitivity)

    sp = sub.add_parser("compare-sensitivity", help="overlay sensitivity curves")
    sp.add_argument("data_dir")
    sp.add_argument("--output-dir", default="reports/sensitivity/comparison")
    sp.set_defaults(fn=cmd_compare_sensitivity)

    sp = sub.add_parser("stats", help="statistical tests on evaluation CSVs")
    sp.add_argument("csvs", nargs="+")
    sp.add_argument("--output-dir", default="reports/statistical_tests")
    sp.set_defaults(fn=cmd_stats)

    sp = sub.add_parser("export-optuna",
                        help="JSON HPO study → optuna SQLite DB "
                             "(readable by optuna-dashboard)")
    sp.add_argument("json_path")
    sp.add_argument("db_path")
    sp.set_defaults(fn=cmd_export_optuna)

    sp = sub.add_parser("import-optuna",
                        help="optuna SQLite DB → JSON HPO study")
    sp.add_argument("db_path")
    sp.add_argument("json_path")
    sp.add_argument("--study-name", default=None)
    sp.set_defaults(fn=cmd_import_optuna)

    sp = sub.add_parser("science-loop",
                        help="planted-signal ablation: train 4 variants, "
                             "evaluate, stats, sensitivity")
    sp.add_argument("--work-dir", default="reports/science")
    sp.add_argument("--hw", type=int, default=64)
    sp.add_argument("--epochs", type=int, default=6)
    sp.set_defaults(fn=cmd_science)

    sp = sub.add_parser("eda", help="dataset EDA tools")
    esub = sp.add_subparsers(dest="eda_command", required=True)
    e = esub.add_parser("extract")
    e.add_argument("data_dir")
    e.add_argument("out_csv")
    e = esub.add_parser("visualize")
    e.add_argument("npz_path")
    e.add_argument("--out", default=None)
    e = esub.add_parser("analyze-csv")
    e.add_argument("csv_path")
    e = esub.add_parser("visualize-tiles")
    e.add_argument("image_dir")
    e.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_eda)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
