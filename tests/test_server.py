"""--mode serve HTTP endpoint (vslnet_tpu/server.py): localize requests
against a live Localizer over stdlib HTTP, batched + top-k + error paths."""
import json
import threading
import urllib.error
import urllib.request

from vslnet_tpu.config import Config
from vslnet_tpu.data.synthetic import synthetic_dataset
from vslnet_tpu.parallel.mesh import make_mesh
from vslnet_tpu.serve import Localizer
from vslnet_tpu.server import durations_from_dataset, make_server
from vslnet_tpu.train.runner import Runner


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode("utf-8"), method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_http_server_localize_health_and_errors(tmp_path):
    configs = Config(
        batch_size=4, max_pos_len=16, video_feature_dim=12, hidden_size=16,
        char_dim=4, word_dim=8, num_heads=4, epochs=1,
        predictor="transformer",
        model_dir=str(tmp_path / "ckpt"), save_dir=str(tmp_path / "d"),
        log_to_tensorboard=False,
    )
    dataset, feats = synthetic_dataset(
        n_train=8, n_test=4, n_videos=4, n_words=40, n_chars=12,
        max_pos_len=16, video_feature_dim=12, word_dim=8, min_video_len=4,
        seed=0,
    )
    runner = Runner(configs, dataset, feats, mesh=make_mesh(1))
    loc = Localizer(runner, dataset["word_dict"], dataset["char_dict"])
    durations = durations_from_dataset(dataset)
    server = make_server(loc, feats, durations, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = "http://127.0.0.1:%d" % port
    try:
        with urllib.request.urlopen(base + "/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["predictor"] == "transformer"
        assert health["videos"] == len(feats)

        vid = dataset["test_set"][0]["vid"]
        dur = durations[vid]

        # single request: duration read from the annotation records
        code, out = _post(base + "/localize",
                          {"vid": vid, "query": "a person opens a door"})
        assert code == 200
        assert out["vid"] == vid
        assert 0.0 <= out["start"] <= out["end"] <= dur + 1e-6

        # list request with uniform top_k: batched, spans ordered by prob
        code, outs = _post(
            base + "/localize",
            [{"vid": vid, "query": "query %d" % i, "top_k": 2}
             for i in range(3)],
        )
        assert code == 200 and len(outs) == 3
        for o in outs:
            assert len(o["spans"]) == 2
            assert o["spans"][0]["prob"] >= o["spans"][1]["prob"]

        # explicit duration overrides the annotation lookup
        code, out2 = _post(
            base + "/localize",
            {"vid": vid, "query": "a person opens a door",
             "duration": 2.0 * dur},
        )
        assert abs(out2["start"] - 2.0 * out["start"]) < 0.01
        assert abs(out2["end"] - 2.0 * out["end"]) < 0.01

        # error paths -> 400 with a JSON error body
        for bad in (
            {"vid": "no-such-video", "query": "x"},
            {"vid": vid},  # missing query
            [{"vid": vid, "query": "a", "top_k": 1},
             {"vid": vid, "query": "b", "top_k": 2}],  # mixed top_k
            [],
        ):
            try:
                _post(base + "/localize", bad)
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "error" in json.loads(e.read())
            else:
                raise AssertionError("expected 400 for %r" % (bad,))

        # unknown paths
        try:
            _post(base + "/nope", {})
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()
