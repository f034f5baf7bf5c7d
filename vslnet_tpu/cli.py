"""CLI entry point — same surface as the reference main.py:16-47:

    python main.py --task charades --predictor rnn --mode train

plus TPU-native flags (--precision, --dp_size, --use_pallas, ...). See
vslnet_tpu/config.py for the full flag list.
"""
import os
import sys

from vslnet_tpu.config import build_parser, load_saved_config, namespace_to_config
from vslnet_tpu.data.datasets import gen_or_load_dataset
from vslnet_tpu.data.features import load_video_features
from vslnet_tpu.train.runner import Runner


def load_or_build_feature_bank(configs):
    """Video features as a packed VideoBank, cached on disk: the first run
    loads every <vid>.npy and downsamples (like the reference does EVERY
    run, util/data_util.py:44-55); later runs mmap the packed bank and
    start instantly."""
    from vslnet_tpu.data.loader import VideoBank

    feature_dir = os.path.join(
        configs.data_root, "features", configs.task, configs.fv
    )
    if not configs.feature_cache:
        return load_video_features(feature_dir, configs.max_pos_len)
    prefix = os.path.join(
        configs.save_dir,
        "_".join([configs.task, configs.fv, str(configs.max_pos_len), "bank"]),
    )
    if VideoBank.exists(prefix):
        return VideoBank.load(prefix, mmap=True)
    bank = VideoBank.wrap(
        load_video_features(feature_dir, configs.max_pos_len),
        configs.max_pos_len, configs.video_feature_dim,
    )
    os.makedirs(configs.save_dir, exist_ok=True)
    bank.save(prefix)
    return bank


def main(argv=None):
    from vslnet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = build_parser()
    ns = parser.parse_args(argv)
    configs = namespace_to_config(ns)
    if configs.t7_checkpoint:
        configs.cqa_bias = True  # t7 dialect (torch CQA output conv has bias)
    external_ckpt = bool(configs.t7_checkpoint or configs.tf_checkpoint)

    if (configs.mode.lower() in ("test", "predict", "export", "serve")
            and not external_ckpt):
        # reload train-time configs, then re-apply explicit CLI overrides
        # (reference main.py:120-123); skipped when importing a torch .t7
        # checkpoint (no local training run exists to reload from)
        model_dir = os.path.join(configs.home_dir(), "model")
        if not os.path.exists(os.path.join(model_dir, "configs.json")):
            raise ValueError("No pre-trained weights exist")
        explicit = {
            a.lstrip("-").split("=")[0]
            for a in (argv if argv is not None else sys.argv[1:])
            if a.startswith("--")
        }
        requested_mode = configs.mode.lower()
        overrides = {k: v for k, v in vars(ns).items() if k in explicit}
        if "dim" in overrides:  # torch-ref CLI alias
            overrides["hidden_size"] = overrides.pop("dim")
        overrides["mode"] = requested_mode
        configs = load_saved_config(model_dir, overrides)

    dataset = gen_or_load_dataset(configs)
    configs.char_size = dataset["n_chars"]
    visual_features = load_or_build_feature_bank(configs)
    runner = Runner(configs, dataset, visual_features)
    print(
        "\x1b[1;33mTotal trainable parameters: {}\x1b[0m".format(runner.n_params()),
        flush=True,
    )
    if configs.mode.lower() == "train":
        runner.train(resume=configs.resume)
    elif configs.mode.lower() == "test":
        runner.test()
    elif configs.mode.lower() == "predict":
        import json

        from vslnet_tpu.serve import Localizer

        def check_vid(vid):
            if vid not in visual_features:
                raise ValueError("No features for video {}".format(vid))

        # one pass over the splits up front: batch inference would otherwise
        # scan every record per request (quadratic in practice)
        from vslnet_tpu.server import durations_from_dataset

        durations = durations_from_dataset(dataset)

        def lookup_duration(vid, explicit):
            # duration (seconds): explicit wins; else look it up from any
            # annotation record of this vid. No silent fallback — a guessed
            # duration scales the decoded span wrong (util/data_util.py:
            # 109-114 decode contract), so it is an error.
            if explicit is not None:
                return explicit
            if vid in durations:
                return durations[vid]
            raise ValueError(
                "Video {} has no annotation record to read its duration "
                "from; pass --duration <seconds> (or a 'duration' field "
                "in --queries_file)".format(vid)
            )

        k = configs.top_k if configs.top_k > 1 else None

        def result_line(vid, query, res):
            if k:
                return json.dumps(
                    {"vid": vid, "query": query,
                     "spans": [
                         {"start": round(s, 3), "end": round(e, 3),
                          "prob": round(p, 6)}
                         for s, e, p in res
                     ]}
                )
            return json.dumps(
                {"vid": vid, "query": query,
                 "start": round(res[0], 3), "end": round(res[1], 3)}
            )

        if not configs.queries_file and (
                not configs.query or not configs.vid):
            raise ValueError(
                "--mode predict requires --query and --vid "
                "(or --queries_file for batch inference)"
            )
        runner.restore()
        loc = Localizer(runner, dataset["word_dict"], dataset["char_dict"])
        if configs.queries_file:
            # batch inference: JSONL in ({"vid", "query", "duration"?}),
            # one prediction JSON line out per request, batched through
            # the compiled eval step batch_size rows at a time
            meta = []
            with open(configs.queries_file, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    vid, query = rec["vid"], rec["query"]
                    check_vid(vid)
                    meta.append(
                        (vid, query, lookup_duration(vid,
                                                     rec.get("duration")))
                    )
            results = loc.localize_batch(
                [(visual_features[v], d, q) for v, q, d in meta], top_k=k
            )
            lines = [
                result_line(vid, query, res)
                for (vid, query, _), res in zip(meta, results)
            ]
            if configs.predictions_out:
                with open(configs.predictions_out, "w",
                          encoding="utf-8") as f:
                    f.write("\n".join(lines) + "\n")
                print(
                    json.dumps({"predictions_out": configs.predictions_out,
                                "n": len(lines)}),
                    flush=True,
                )
            else:
                for line in lines:
                    print(line, flush=True)
        else:
            check_vid(configs.vid)
            duration = lookup_duration(configs.vid, configs.duration)
            res = loc.localize(
                visual_features[configs.vid], duration, configs.query,
                top_k=k,
            )
            print(result_line(configs.vid, configs.query, res), flush=True)
    elif configs.mode.lower() == "serve":
        # built-in HTTP endpoint (vslnet_tpu/server.py): POST /localize,
        # GET /healthz; zero third-party dependencies
        from vslnet_tpu.serve import Localizer
        from vslnet_tpu.server import durations_from_dataset, run_server

        runner.restore()
        loc = Localizer(runner, dataset["word_dict"], dataset["char_dict"])
        run_server(
            loc, visual_features, durations_from_dataset(dataset),
            host=configs.serve_host, port=configs.port,
        )
    elif configs.mode.lower() == "export":
        # serialize the restored eval step (weights baked in) as a
        # self-contained StableHLO serving artifact (vslnet_tpu/export.py)
        from vslnet_tpu.export import export_artifact

        runner.restore()
        out_path = configs.export_path or os.path.join(
            configs.home_dir(), "model", "exported.vslx"
        )
        platforms = tuple(
            p.strip() for p in configs.export_platforms.split(",") if p.strip()
        )
        header = export_artifact(runner, out_path, platforms=platforms)
        import json

        print(json.dumps({"export_path": out_path, **header}), flush=True)
    else:
        raise ValueError("Unknown mode {}!!!".format(configs.mode))


if __name__ == "__main__":
    main()
