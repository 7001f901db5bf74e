"""Serving CLI: micro-batching HTTP server answers with the same tokens
as a direct Transcriber call."""

import io
import json
import threading
import urllib.request

import numpy as np

from phones_las_tpu.api import Transcriber
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli
from phones_las_tpu.cli.serve import make_server
from phones_las_tpu.data.audio_io import write_wav


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_roundtrip(tmp_path):
    data, wd = str(tmp_path / "d"), str(tmp_path / "w")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "10",
                      "--n-phones", "4"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
        "--encoder-layers", "2", "--encoder-units", "16",
        "--decoder-units", "16", "--embedding-dim", "8",
        "--attention-units", "16",
    ])
    t = Transcriber(wd)
    rs = np.random.RandomState(0)
    pcm = (rs.randn(9000) * 2000).astype(np.int16)
    expected = t.transcribe(pcm)

    server, worker = make_server(t, "127.0.0.1", 0, max_batch=4,
                                 batch_wait_ms=30.0)
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    try:
        base = f"http://127.0.0.1:{port}"
        code, health = _post_get(base + "/healthz")
        assert code == 200 and health["status"] == "ok"

        # wav upload
        buf = str(tmp_path / "c.wav")
        write_wav(buf, pcm)
        code, res = _post(base + "/transcribe", open(buf, "rb").read())
        assert code == 200, res
        assert res["tokens"] == expected

        # raw PCM path, two concurrent requests → one micro-batch
        raw = pcm.tobytes()
        results = [None, None]

        def hit(i):
            results[i] = _post(base + "/transcribe?raw=1", raw)

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
        [x.start() for x in ts]
        [x.join() for x in ts]
        for code, res in results:
            assert code == 200 and res["tokens"] == expected

        # malformed body → 400, server stays up
        code, res = _post(base + "/transcribe", b"not audio")
        assert code == 400 and "error" in res
        code, res = _post(base + "/transcribe?raw=1", b"")
        assert code == 400
    finally:
        worker.stop()
        server.shutdown()


def _post_get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())
