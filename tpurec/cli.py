"""Command-line interface: datagen / train / index / serve.

One typed CLI replacing the reference's per-chapter ``__main__`` argparse
blocks and stringly-typed ``eval()`` flags (SURVEY §5 config section).

    python -m tpurec.cli datagen --family tabular --raw data/raw --out data/gen
    python -m tpurec.cli train --config exp.json --data data/gen --workdir run1
    python -m tpurec.cli index --export run1/export --data data/gen --out run1/index
    python -m tpurec.cli serve --export run1/export --data data/gen --index run1/index --port 5000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# TPUREC_PLATFORM=cpu forces the CPU backend (e.g. when another process holds
# the TPU chip). Must be applied through jax.config — the axon sitecustomize
# overrides the JAX_PLATFORMS env var.
if os.environ.get("TPUREC_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["TPUREC_PLATFORM"])


def cmd_datagen(args):
    from tpurec.data import generators

    if args.family == "tabular":
        gen = generators.TabularDataGenerator(
            output_path=args.out,
            item_path=os.path.join(args.raw, "item_feature.dat"),
            user_path=os.path.join(args.raw, "user_feature.dat"),
            main_path=os.path.join(args.raw, "shop.dat"),
        )
    elif args.family == "impression":
        gen = generators.ImpressionLogGenerator(
            args.out, os.path.join(args.raw, "impression_log.jsonl")
        )
    elif args.family == "sequence":
        gen = generators.SequenceDataGenerator(
            args.out, os.path.join(args.raw, "events.jsonl"),
            max_seq_length=args.max_seq_length,
        )
    else:
        raise SystemExit(f"unknown family {args.family}")
    info = gen.run_all()
    print(f"wrote {args.out}: {info.total_dims} ids over {len(info.feature_names)} features")


def cmd_synth(args):
    from tpurec.data import synthetic

    if args.family == "tabular":
        synthetic.make_ecommerce_raw(args.out, n_events=args.n_events, seed=args.seed)
    elif args.family == "impression":
        synthetic.make_impression_log_raw(args.out, n_events=args.n_events, seed=args.seed)
    elif args.family == "sequence":
        synthetic.make_behavior_sequence_raw(args.out, n_events=args.n_events, seed=args.seed)
    print(f"wrote synthetic raw data to {args.out}")


def cmd_train(args):
    from tpurec.config import ExperimentConfig
    from tpurec.data.loader import ArrayLoader, load_columnar, shard_paths
    from tpurec.data.schema import DataInfo
    from tpurec.train import Trainer

    if args.config:
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
    else:
        cfg = ExperimentConfig()
    if args.model:
        cfg = cfg.replace(model=cfg.model.replace(name=args.model))
    if args.workdir:
        cfg = cfg.replace(
            train=cfg.train.replace(
                checkpoint_dir=os.path.join(args.workdir, "checkpoint"),
                tensorboard_dir=os.path.join(args.workdir, "tensorboard"),
            )
        )
    info = DataInfo.load(args.data)
    train = load_columnar(shard_paths(args.data, "train"))
    test = load_columnar(shard_paths(args.data, "test"))
    trainer = Trainer(cfg, info)
    bs = cfg.train.batch_size
    state, report = trainer.run(
        lambda: iter(ArrayLoader(train, bs, seed=cfg.train.seed)),
        lambda: iter(ArrayLoader(test, bs, shuffle=False, pad_final=True)),
        restore=args.restore,
    )
    if args.workdir:
        trainer.export(state, os.path.join(args.workdir, "export"))
        with open(os.path.join(args.workdir, "report.json"), "w") as f:
            json.dump(report, f, indent=2, default=float)
    print("best eval:", report["best_eval"])


def cmd_index(args):
    from tpurec.data.schema import DataInfo
    from tpurec.serving import DictKVStore, OfflineIndexer
    from tpurec.serving.export import load_servable

    info = DataInfo.load(args.data)
    servable = load_servable(args.export, info)
    if servable.user_tower is None:
        raise SystemExit("exported model has no towers; index needs a two-tower model")
    with open(os.path.join(args.data, "user_profile.json")) as f:
        user_profile = json.load(f)
    with open(os.path.join(args.data, "item_profile.json")) as f:
        item_profile = json.load(f)
    kv = DictKVStore(os.path.join(args.out, "kv_store.json"))
    indexer = OfflineIndexer(
        servable.user_tower, servable.item_tower, user_profile, item_profile,
        info.user_features, info.item_features,
    )
    result = indexer.run(args.out, kv_store=kv, topk=args.topk)
    kv.save()
    print(f"indexed {result['num_users']} users x {result['num_items']} items → {args.out}")


def cmd_serve(args):
    import numpy as np

    from tpurec.data.schema import DataInfo
    from tpurec.serving.export import load_servable
    from tpurec.serving.kvstore import DictKVStore
    from tpurec.serving.server import RecommendService, make_server

    info = DataInfo.load(args.data)
    servable = load_servable(args.export, info)
    with open(os.path.join(args.data, "user_profile.json")) as f:
        user_profile = json.load(f)
    with open(os.path.join(args.data, "item_profile.json")) as f:
        item_profile = json.load(f)
    kv = DictKVStore(os.path.join(args.index, "kv_store.json")) if args.index else None
    item_ids, item_emb = [], None
    if args.index:
        idx = np.load(os.path.join(args.index, "topk_index.npz"), allow_pickle=False)
        item_ids = [str(x) for x in idx["item_ids"]]
        item_emb = idx["item_embeddings"]
    service = RecommendService(
        user_tower=servable.user_tower,
        ranker=servable.rank,
        user_profile=user_profile,
        item_profile=item_profile,
        user_feature_names=info.user_features,
        item_feature_names=info.item_features,
        kv_store=kv,
        item_ids=item_ids,
        item_embeddings=item_emb,
    )
    server = make_server(service, args.host, args.port)
    print(f"serving on http://{args.host}:{server.server_address[1]}/predict")
    server.serve_forever()


def main(argv=None):
    p = argparse.ArgumentParser(prog="tpurec")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("datagen", help="raw files → TFRecords + metadata")
    d.add_argument("--family", choices=["tabular", "impression", "sequence"], required=True)
    d.add_argument("--raw", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--max-seq-length", type=int, default=30, dest="max_seq_length")
    d.set_defaults(fn=cmd_datagen)

    s = sub.add_parser("synth", help="generate synthetic raw data")
    s.add_argument("--family", choices=["tabular", "impression", "sequence"], required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--n-events", type=int, default=100_000, dest="n_events")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_synth)

    t = sub.add_parser("train", help="train a model on generated data")
    t.add_argument("--config", help="ExperimentConfig JSON file")
    t.add_argument("--model", help="registry name override")
    t.add_argument("--data", required=True)
    t.add_argument("--workdir", default="")
    t.add_argument("--restore", action="store_true")
    t.set_defaults(fn=cmd_train)

    i = sub.add_parser("index", help="offline retrieval indexing")
    i.add_argument("--export", required=True)
    i.add_argument("--data", required=True)
    i.add_argument("--out", required=True)
    i.add_argument("--topk", type=int, default=20)
    i.set_defaults(fn=cmd_index)

    v = sub.add_parser("serve", help="online HTTP serving")
    v.add_argument("--export", required=True)
    v.add_argument("--data", required=True)
    v.add_argument("--index", default="")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=5000)
    v.set_defaults(fn=cmd_serve)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
