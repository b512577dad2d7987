"""Command-line entry point.

Counterpart of reference ``run_command.py:8-47``: auto-generated ``--flag``
per config dataclass field plus a ``--type`` dispatch:

    python -m laplace_gnn_recommendation_tpu.cli --type preprocess
    python -m laplace_gnn_recommendation_tpu.cli --type preprocess_fashion
    python -m laplace_gnn_recommendation_tpu.cli --type lightgcn
    python -m laplace_gnn_recommendation_tpu.cli --type encoder
    python -m laplace_gnn_recommendation_tpu.cli --type submission
    python -m laplace_gnn_recommendation_tpu.cli --type hpo
"""
from __future__ import annotations

import argparse

from .configs import add_dataclass_args, apply_parsed_args, lightgcn_config, link_pred_config, preprocessing_config


def run() -> None:
    parser = argparse.ArgumentParser(description="laplace_gnn_recommendation_tpu")
    parser.add_argument(
        "--type",
        required=True,
        choices=[
            "preprocess", "preprocess_fashion", "lightgcn", "encoder",
            "submission", "hpo", "pinsage",
        ],
    )
    parser.add_argument("--artifact_dir", default="data/derived")
    parser.add_argument("--raw_dir", default="data/original")
    # mesh axes for launcher-driven multi-chip/multi-host runs (MeshConfig
    # is skipped by the auto-flag generator; these map onto it explicitly)
    parser.add_argument("--mesh_data_axis", type=int, default=None)
    parser.add_argument("--mesh_model_axis", type=int, default=None)
    parser.add_argument("--model_dir", default="model/saved")
    # same value-typed contract as the auto-generated bool flags
    # ("--resume true"/"--resume false" keep working); bare "--resume"
    # also reads as true
    parser.add_argument(
        "--resume",
        type=lambda s: s.lower() in ("1", "true", "yes"),
        nargs="?", const=True, default=False,
    )
    add_dataclass_args(parser, link_pred_config)
    add_dataclass_args(parser, lightgcn_config)
    args, _ = parser.parse_known_args()

    if args.type not in ("preprocess", "preprocess_fashion"):
        # multi-host pod launches set a coordinator address; single-process
        # runs no-op (the preprocessing entries never touch devices)
        from .parallel.mesh import distributed_init

        distributed_init()

    if args.type == "preprocess":
        from .data.preprocess_movielens import preprocess

        preprocess(preprocessing_config, args.raw_dir, args.artifact_dir)
    elif args.type == "preprocess_fashion":
        from .data.preprocess_fashion import preprocess

        preprocess(preprocessing_config, args.raw_dir, args.artifact_dir)
    elif args.type == "lightgcn":
        import dataclasses as _dc
        import json as _json

        from .data.link_pred_data import create_link_pred_data_from_artifacts
        from .data.lightgcn_data import lightgcn_data_from_hetero
        from .train.lightgcn_pipeline import train

        cfg = apply_parsed_args(lightgcn_config, args)
        if args.mesh_data_axis is not None:
            cfg.mesh.data_axis = args.mesh_data_axis
        if args.mesh_model_axis is not None:
            cfg.mesh.model_axis = args.mesh_model_axis
        data_bundle, _ = create_link_pred_data_from_artifacts(args.artifact_dir, link_pred_config)
        data = lightgcn_data_from_hetero(data_bundle.graph)
        stats = train(cfg, data)
        print("FINAL_STATS " + _json.dumps(_dc.asdict(stats)))
    elif args.type == "encoder":
        import dataclasses as _dc
        import json as _json

        from .data.link_pred_data import create_link_pred_data_from_artifacts
        from .train.encdec_pipeline import run_pipeline

        cfg = apply_parsed_args(link_pred_config, args)
        if args.mesh_data_axis is not None:
            cfg.mesh.data_axis = args.mesh_data_axis
        if args.mesh_model_axis is not None:
            cfg.mesh.model_axis = args.mesh_model_axis
        data, _ = create_link_pred_data_from_artifacts(args.artifact_dir, cfg)
        stats = run_pipeline(
            cfg, data, model_dir=args.model_dir, resume=args.resume
        )
        print("FINAL_STATS " + _json.dumps(_dc.asdict(stats)))
    elif args.type == "submission":
        from .data.link_pred_data import create_link_pred_data_from_artifacts
        from .train.submission import submission_pipeline

        cfg = apply_parsed_args(link_pred_config, args)
        data, artifacts = create_link_pred_data_from_artifacts(args.artifact_dir, cfg)
        submission_pipeline(
            cfg, data,
            {str(k): v for k, v in artifacts.customer_id_map_forward.items()},
            {str(k): v for k, v in artifacts.article_id_map_forward.items()},
        )
    elif args.type == "hpo":
        from .train.hpo import run_hpo

        run_hpo(args.artifact_dir)
    elif args.type == "pinsage":
        from .train.pinsage_pipeline import run_pinsage_cli

        run_pinsage_cli(args.artifact_dir)


if __name__ == "__main__":
    run()
