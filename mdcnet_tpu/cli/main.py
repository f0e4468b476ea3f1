"""Command-line entry points: train / infer / eval / benchmark.

The reference's drivers are hardcoded-path scripts executed top to bottom
(trail_01.py, inference_p.py, SURVEY §5.6).  Here one argparse CLI exposes
the same workflows with the preset geometries:

  python -m mdcnet_tpu.cli.main train --annotations a.txt --images dir/
  python -m mdcnet_tpu.cli.main infer --annotations a.txt --images dir/ \\
      --checkpoint ckpts/ --beam 3
  python -m mdcnet_tpu.cli.main eval --annotations a.txt --images dir/
  python -m mdcnet_tpu.cli.main benchmark
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--annotations", default="", help="annotation txt path")
    p.add_argument("--images", default="", help="image folder")
    p.add_argument("--preset", default="large",
                   choices=["large", "neu", "tiny", "test"])
    p.add_argument("--synthetic-images", action="store_true",
                   help="use synthetic pixels (no image files needed)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--axial", action="store_true",
                   help="use the axial-attention decoder variant")


def get_config(args):
    from mdcnet_tpu import config as C
    cfg = {"large": C.large_preset, "neu": C.neu_preset,
           "tiny": C.tiny_preset, "test": C.test_preset}[args.preset]()
    if args.batch_size:
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, batch_size=args.batch_size))
    if getattr(args, "axial", False):
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, axial=True))
    return cfg


def load_data(args, cfg):
    from mdcnet_tpu.data import annotations as ann
    from mdcnet_tpu.text import SeqTokenizer, gc10_vocabulary

    records = ann.txt_file_to_records(args.annotations, args.images)
    if not args.synthetic_images:
        records = ann.filter_existing_images(records)
    vocab = gc10_vocabulary(records["caption"].tolist(),
                            cfg.data.freq_threshold)
    tokenizer = SeqTokenizer(vocab, num_classes=cfg.data.num_classes,
                             num_bins=cfg.data.num_bins,
                             width=cfg.data.img_size,
                             height=cfg.data.img_size,
                             max_len=cfg.data.max_len)
    # decoder vocab must cover word vocab + codes (trail_01.py:108-115)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, vocab_size=tokenizer.total_vocab_size))
    return records, tokenizer, cfg


def cmd_train(args):
    from mdcnet_tpu.train.loop import train_from_config
    from mdcnet_tpu.utils.logging import MetricLogger

    cfg = get_config(args)
    if args.epochs:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                    epochs=args.epochs))
    if args.checkpoint_dir:
        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, checkpoint_dir=args.checkpoint_dir))
    if args.pretrained:
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, pretrained_path=args.pretrained))
    records, tokenizer, cfg = load_data(args, cfg)
    # full config dump at run init (trail_01.py:135-151 wandb.init(config=…))
    logger = MetricLogger(csv_path=args.log_csv or None,
                          use_wandb=args.wandb,
                          wandb_kwargs={"project": "mdcnet_tpu",
                                        "config": dataclasses.asdict(cfg)})
    mesh = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        from mdcnet_tpu.parallel import sharding as sh
        mesh = sh.make_mesh(data=args.mesh_data, model=args.mesh_model)
    state = train_from_config(cfg, records, tokenizer, logger=logger,
                              synthetic_images=args.synthetic_images,
                              mesh=mesh, resume=not args.no_resume)
    print(f"done: {int(state.step)} steps")


def _init_params(model, cfg, images, checkpoint: str):
    """Init params at the batch shape; restore from a reference ``.pth`` or
    an orbax checkpoint directory when given."""
    import jax
    import jax.numpy as jnp
    params = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(1)}, images,
        jnp.zeros((images.shape[0], 10), jnp.int32))
    if not checkpoint:
        return params
    if checkpoint.endswith(".pth"):
        from mdcnet_tpu.models.torch_convert import (convert_state_dict,
                                                     load_pth)
        return convert_state_dict(load_pth(checkpoint),
                                  cfg.model.enc_depth, cfg.model.dec_layers)
    from mdcnet_tpu.train.checkpoint import CheckpointManager
    from mdcnet_tpu.train.state import TrainState, make_optimizer
    tx = make_optimizer(cfg.train)
    template = TrainState(params=params,
                          opt_state=tx.init(params["params"]),
                          step=jnp.zeros((), jnp.int32),
                          rng=jax.random.PRNGKey(0))
    return CheckpointManager(checkpoint).restore(template).params


def cmd_infer(args):
    """Full-split inference driver: generate on every test batch, print a
    JSON row per image, optionally save prediction-overlay images
    (inference_p.py:238-258 / inference_trail_after_good_map.py:232-258)."""
    import os

    import jax
    import jax.numpy as jnp
    from mdcnet_tpu.data.pipeline import make_loaders
    from mdcnet_tpu.data.augment import preprocess
    from mdcnet_tpu.infer import beam_search, generate, postprocess
    from mdcnet_tpu.models import build_model

    cfg = get_config(args)
    records, tokenizer, cfg = load_data(args, cfg)
    model = build_model(cfg.model)
    _, _, test_loader = make_loaders(records, tokenizer, cfg.data,
                                     synthetic_images=args.synthetic_images)
    rng = jax.random.PRNGKey(0)
    params = None
    if args.preset == "neu":
        # NEU-DET labels are raw ids 0-5 (inference_p.py:22)
        from mdcnet_tpu.config import NEU_CLASS_IDS
        id2cls = {i: name for name, i in NEU_CLASS_IDS.items()}
    else:
        id2cls = {c: tokenizer.vocab.itos.get(c, str(c))
                  for c in range(258, 268)}
    if args.save_overlays:
        os.makedirs(args.save_overlays, exist_ok=True)
    img_idx = 0
    for b, batch in enumerate(test_loader):
        if args.limit_batches and b >= args.limit_batches:
            break
        images = preprocess(jnp.asarray(batch.images), rng,
                            cfg.data.img_size, train=False)
        if params is None:
            params = _init_params(model, cfg, images, args.checkpoint)
        if args.beam > 1:
            out = beam_search(model, params, images,
                              steps=cfg.infer.generation_steps,
                              beam_size=args.beam)
            tokens = np.asarray(out.tokens[:, 0])
            confs = np.asarray(out.confs[:, 0])  # top beam's surface
        else:
            res = generate(model, params, images, rng,
                           steps=cfg.infer.generation_steps,
                           top_k=cfg.infer.top_k, top_p=cfg.infer.top_p)
            tokens, confs = np.asarray(res.tokens), np.asarray(res.confs)
        bboxes, labels, captions, cf = postprocess(tokens, confs, tokenizer)
        for i in range(len(labels)):
            print(json.dumps({"labels": labels[i], "bboxes": bboxes[i],
                              "caption": captions[i]}))
            if args.save_overlays and labels[i]:
                from mdcnet_tpu.utils.drawing import visualize
                img = np.asarray(batch.images[i]).astype("uint8")
                overlay = visualize(img, bboxes[i], labels[i],
                                    id2cls=id2cls,
                                    captions=[captions[i]] * len(labels[i]))
                overlay.save(os.path.join(args.save_overlays,
                                          f"pred_{img_idx:05d}.png"))
            img_idx += 1


def cmd_eval(args):
    import jax
    import jax.numpy as jnp
    from mdcnet_tpu.data.augment import preprocess
    from mdcnet_tpu.data.pipeline import make_loaders
    from mdcnet_tpu.evals import MeanAveragePrecision, calculate_bleu_scores
    from mdcnet_tpu.infer import generate
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.text import decode_jax

    cfg = get_config(args)
    records, tokenizer, cfg = load_data(args, cfg)
    model = build_model(cfg.model)
    _, valid_loader, _ = make_loaders(records, tokenizer, cfg.data,
                                      synthetic_images=args.synthetic_images)
    rng = jax.random.PRNGKey(0)
    map_metric = MeanAveragePrecision(iou_threshold=0.3, class_metrics=True)
    bleus = []
    params = None
    for b, batch in enumerate(valid_loader):
        if args.limit_batches and b >= args.limit_batches:
            break
        images = preprocess(jnp.asarray(batch.images), rng,
                            cfg.data.img_size, train=False)
        if params is None:
            params = _init_params(model, cfg, images, args.checkpoint)
        # conf_every=1 keeps every step's top-1 probability so detections
        # can be score-ranked by coordinate-token probability like
        # decode_bboxes_and_labels_with_scores (data_processing.py:601-666)
        res = generate(model, params, images, rng,
                       steps=cfg.infer.generation_steps, conf_every=1)
        scores_full = jnp.concatenate(
            [jnp.ones((images.shape[0], 1), jnp.float32), res.confs], axis=1)
        pred = decode_jax.decode_groups(res.tokens, pred_scores=scores_full,
                                        max_groups=8)
        gt = decode_jax.decode_groups(jnp.asarray(batch.tokens), max_groups=8)
        for i in range(images.shape[0]):
            n_p, n_g = int(pred.count[i]), int(gt.count[i])
            map_metric.update(
                [{"boxes": np.asarray(pred.boxes[i][:n_p]),
                  "scores": np.asarray(pred.scores[i][:n_p]),
                  "labels": np.asarray(pred.labels[i][:n_p])}],
                [{"boxes": np.asarray(gt.boxes[i][:n_g]),
                  "labels": np.asarray(gt.labels[i][:n_g])}])
            ref = tokenizer.decode_captions(batch.tokens[i]).tolist()
            hyp = tokenizer.decode_captions(np.asarray(res.tokens[i])).tolist()
            bleus.extend(calculate_bleu_scores([ref], [hyp]))
    scores = map_metric.compute()
    out = {"map@0.3": scores["map"],
           "bleu": float(np.mean(bleus)) if bleus else 0.0}
    for cls, ap in scores.get("map_per_class", {}).items():
        out[f"map@0.3/class_{cls}"] = ap
    print(json.dumps(out))


def cmd_streaming(args):
    """512² context-parallel streaming eval (BASELINE config 5)."""
    import jax
    import jax.numpy as jnp
    from mdcnet_tpu.config import streaming_preset
    from mdcnet_tpu.infer.generate import postprocess
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.parallel import sharding as sh
    from mdcnet_tpu.parallel.streaming import streaming_eval_step

    cfg = streaming_preset()
    records, tokenizer, cfg = load_data(args, cfg)
    model = build_model(cfg.model)
    n = len(jax.devices())
    ctx = args.context or (min(4, n) if n > 1 else 1)
    mesh = sh.make_mesh(data=1, context=ctx)
    images = jax.random.uniform(
        jax.random.PRNGKey(0),
        (args.batch_size or 4, cfg.data.img_size, cfg.data.img_size, 3))
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(1)},
                                 images, jnp.zeros((images.shape[0], 10),
                                                   jnp.int32))
    out = streaming_eval_step(model, params, images, mesh,
                              jax.random.PRNGKey(2),
                              steps=cfg.infer.generation_steps)
    bboxes, labels, captions, _ = postprocess(
        np.asarray(out.tokens), np.asarray(out.confs), tokenizer)
    for i in range(len(labels)):
        print(json.dumps({"labels": labels[i], "caption": captions[i]}))


def cmd_serve(args):
    """Continuous-batching serving benchmark: stream the test split through
    the slot-pool engine at an open-loop arrival rate and report
    throughput + latency percentiles (the runtime tier the reference's
    offline batch loops lack; serve/engine.py)."""
    import time

    import jax
    import jax.numpy as jnp
    from mdcnet_tpu.data.pipeline import make_loaders
    from mdcnet_tpu.infer.generate import postprocess
    from mdcnet_tpu.models import build_model
    from mdcnet_tpu.serve import Request, ServingEngine, latency_stats

    cfg = get_config(args)
    records, tokenizer, cfg = load_data(args, cfg)
    model = build_model(cfg.model)
    _, _, test_loader = make_loaders(records, tokenizer, cfg.data,
                                     synthetic_images=args.synthetic_images)

    images = []
    for batch in test_loader:
        images.extend(np.asarray(batch.images))
        if len(images) >= args.requests:
            break
    images = (images * (args.requests // max(1, len(images)) + 1)
              )[: args.requests]

    params = _init_params(
        model, cfg,
        jnp.zeros((1, cfg.data.img_size, cfg.data.img_size, 3)),
        args.checkpoint)
    tables = None
    if args.speculative:
        # drafter tables from the training annotations (the caption
        # template distribution the model converges to)
        from mdcnet_tpu.infer.speculative import build_draft_tables
        seqs = [np.asarray(tokenizer.process_single_pair(
            int(records["label"][i]),
            [min(float(records[c][i]), float(cfg.data.img_size))
             for c in ("xmin", "ymin", "xmax", "ymax")],
            records["caption"][i])) for i in range(len(records["label"]))]
        tables = build_draft_tables(seqs, cfg.model.vocab_size)
    eng = ServingEngine(model, params, slots=args.slots,
                        admit_width=args.admit_width,
                        segment_steps=args.segment_steps,
                        max_steps=cfg.infer.generation_steps,
                        img_size=cfg.data.img_size,
                        draft_tables=tables, draft_k=args.draft_k)

    # open-loop arrivals: exponential gaps at --rate req/s (0 = all at once)
    arrivals = np.zeros(args.requests)
    if args.rate > 0:
        gaps = np.random.default_rng(0).exponential(1.0 / args.rate,
                                                    args.requests)
        arrivals = np.cumsum(gaps)
    reqs = [Request(rid=i, image=images[i], arrival=float(arrivals[i]))
            for i in range(args.requests)]

    # warmup: compile all three device programs off the clock
    eng.serve([Request(rid=-1, image=images[0])])
    eng._reset()

    t0 = time.perf_counter()
    comps = eng.serve(reqs)
    stats = latency_stats(comps, time.perf_counter() - t0)
    stats["rate_rps"] = args.rate
    stats["slots"] = args.slots
    if args.show > 0:
        for c in sorted(comps, key=lambda c: c.rid)[: args.show]:
            _, labels, captions, _ = postprocess(
                c.tokens[None], np.zeros((1, 32)), tokenizer)
            print(json.dumps({"rid": c.rid, "labels": labels[0],
                              "caption": captions[0],
                              "latency_ms": round(c.latency * 1e3, 1)}))
    print("SERVE " + json.dumps(stats))


def cmd_benchmark(args):
    import bench
    bench.main()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mdcnet_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--log-csv", default="")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--mesh-data", type=int, default=1,
                   help="data-parallel axis size")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel axis size")
    p.add_argument("--no-resume", action="store_true",
                   help="ignore existing checkpoints, start fresh")
    p.add_argument("--pretrained", default="",
                   help="converted ImageNet encoder .npz "
                        "(scripts/convert_pretrained.py)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("infer")
    _add_common(p)
    p.add_argument("--checkpoint", default="",
                   help=".pth file or orbax checkpoint directory")
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--limit-batches", type=int, default=0,
                   help="stop after N batches (0 = whole split)")
    p.add_argument("--save-overlays", default="",
                   help="directory for prediction-overlay images")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("eval")
    _add_common(p)
    p.add_argument("--checkpoint", default="",
                   help=".pth file or orbax checkpoint directory")
    p.add_argument("--limit-batches", type=int, default=0,
                   help="stop after N batches (0 = whole split)")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("streaming")
    _add_common(p)
    p.add_argument("--context", type=int, default=None,
                   help="context-parallel axis size")
    p.set_defaults(fn=cmd_streaming)

    p = sub.add_parser("serve")
    _add_common(p)
    p.add_argument("--checkpoint", default="",
                   help=".pth file or orbax checkpoint directory")
    p.add_argument("--requests", type=int, default=256,
                   help="total requests to stream through the engine")
    p.add_argument("--rate", type=float, default=0.0,
                   help="open-loop arrival rate, req/s (0 = all at once)")
    p.add_argument("--slots", type=int, default=64,
                   help="resident decode lanes")
    p.add_argument("--admit-width", type=int, default=16,
                   help="newcomer encode batch width")
    p.add_argument("--segment-steps", type=int, default=8,
                   help="decode steps per host sync")
    p.add_argument("--show", type=int, default=0,
                   help="print the first N completions as JSON rows")
    p.add_argument("--speculative", action="store_true",
                   help="draft-K verified decode (matches greedy up to "
                   "bf16 argmax ties; fewer decoder calls)")
    p.add_argument("--draft-k", type=int, default=8,
                   help="speculative verify block width")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("benchmark")
    p.set_defaults(fn=cmd_benchmark)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
