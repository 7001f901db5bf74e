"""Serving CLI: micro-batching HTTP server answers with the same tokens
as a direct Transcriber call."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from phones_las_tpu.api import Transcriber
from phones_las_tpu.cli import prepare as prepare_cli
from phones_las_tpu.cli import train as train_cli
from phones_las_tpu.cli.serve import StreamSession, make_server
from phones_las_tpu.data.audio_io import write_wav

pytestmark = pytest.mark.slow


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    """One tiny trained model shared by every serve test (2 optimization
    steps — serving behavior only needs decode determinism, not accuracy)."""
    root = tmp_path_factory.mktemp("serve")
    data, wd = str(root / "d"), str(root / "w")
    prepare_cli.main(["synthetic", "--out", data, "--n-utts", "10",
                      "--n-phones", "4"])
    train_cli.main([
        "--preset", "timit_phone_las", "--data", data, "--workdir", wd,
        "--num-steps", "2", "--batch-size", "4",
        "--encoder-layers", "2", "--encoder-units", "16",
        "--decoder-units", "16", "--embedding-dim", "8",
        "--attention-units", "16",
    ])
    return wd


def test_serve_roundtrip(tmp_path, workdir):
    t = Transcriber(workdir)
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

        # observability: Prometheus-text counters reflect the traffic above
        with urllib.request.urlopen(base + "/metrics", timeout=30) as r:
            text = r.read().decode()
        assert 'plu_requests_total{endpoint="/transcribe",status="200"} 3' in text
        assert 'status="400"' in text
        assert "plu_batches_total" in text and "plu_queue_depth 0" in text
        assert "plu_audio_seconds_total" in text
        assert "plu_request_latency_seconds_count 3" in text
    finally:
        worker.stop()
        server.shutdown()


def _post_get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_stream_session_matches_transcribe_long(workdir):
    """Incremental session output (all feeds + end, concatenated) must be
    byte-identical to the offline sliding-window transcription — the
    stream is just transcribe_long with tokens released early."""
    t = Transcriber(workdir)
    rs = np.random.RandomState(3)
    audio = (rs.randn(3 * 16000 + 777) * 2000).astype(np.int16)  # ~3 s
    offline = t.transcribe_long(
        audio, window_seconds=0.8, overlap_seconds=0.3
    )

    for chunk in (1777, 16000, len(audio)):  # tiny, ~1 s, single-shot
        sess = StreamSession(t, window_seconds=0.8, overlap_seconds=0.3)
        toks = []
        for ofs in range(0, len(audio), chunk):
            toks += sess.feed(audio[ofs : ofs + chunk])
        toks += sess.end()
        assert toks == offline, (chunk, toks, offline)

    # legacy fixed-stride mode: same equality under segmentation="overlap"
    offline_o = t.transcribe_long(
        audio, window_seconds=0.8, overlap_seconds=0.3,
        segmentation="overlap",
    )
    sess = StreamSession(t, window_seconds=0.8, overlap_seconds=0.3,
                         segmentation="overlap")
    toks = []
    for ofs in range(0, len(audio), 16000):
        toks += sess.feed(audio[ofs : ofs + 16000])
    toks += sess.end()
    assert toks == offline_o, (toks, offline_o)

    # short stream (≤ one window) delegates to transcribe() exactly like
    # transcribe_long does, so the transcript is identical either way
    sess = StreamSession(t, window_seconds=2.0, overlap_seconds=0.5)
    assert sess.feed(audio[:8000]) == []
    short = sess.end()
    assert short == t.transcribe_long(
        audio[:8000], window_seconds=2.0, overlap_seconds=0.5
    )

    # empty stream
    sess = StreamSession(t)
    assert sess.end() == []

    # client-supplied params are validated with real exceptions (not
    # assert, which python -O strips): overlap >= window would make the
    # feed loop never advance
    with pytest.raises(ValueError):
        StreamSession(t, window_seconds=1.0, overlap_seconds=1.0)


def test_long_upload_routes_to_long_form(workdir):
    """/transcribe uploads beyond the threshold must go through the
    sliding-window path (a one-shot decode would truncate at the cap)."""
    t = Transcriber(workdir)
    rs = np.random.RandomState(6)
    audio = (rs.randn(3 * 16000) * 2000).astype(np.int16)
    expected = t.transcribe_long(audio)

    server, worker = make_server(
        t, "127.0.0.1", 0, max_batch=2, long_form_threshold_s=1.0
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        code, res = _post(base + "/transcribe?raw=1", audio.tobytes())
        assert code == 200, res
        assert res["tokens"] == expected
        # short upload still uses the micro-batch path
        code, res = _post(base + "/transcribe?raw=1", audio[:8000].tobytes())
        assert code == 200 and res["tokens"] == t.transcribe(audio[:8000])
    finally:
        worker.stop()
        server.shutdown()


def test_stream_session_ttl_eviction(workdir):
    t = Transcriber(workdir)
    server, worker = make_server(
        t, "127.0.0.1", 0, max_batch=2, session_ttl_s=0.05
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        import time

        base = f"http://127.0.0.1:{port}"
        code, res = _post(base + "/stream/start", b"")
        assert code == 200
        stale = res["id"]
        time.sleep(0.2)
        # starting a new session sweeps the idle one
        code, res = _post(base + "/stream/start", b"")
        assert code == 200
        code, _ = _post(base + f"/stream/{stale}", b"\x00\x00")
        assert code == 404  # evicted
        code, _ = _post(base + f"/stream/{res['id']}", b"\x00\x00")
        assert code == 200  # fresh one still alive
    finally:
        worker.stop()
        server.shutdown()


def test_stream_http_endpoints(workdir):
    t = Transcriber(workdir)
    rs = np.random.RandomState(4)
    audio = (rs.randn(2 * 16000) * 2000).astype(np.int16)
    offline = t.transcribe_long(
        audio, window_seconds=0.8, overlap_seconds=0.3
    )

    server, worker = make_server(t, "127.0.0.1", 0, max_batch=4)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        code, res = _post(base + "/stream/start?window_s=0.8&overlap_s=0.3",
                          b"")
        assert code == 200, res
        sid = res["id"]
        toks = []
        for ofs in range(0, len(audio), 16000):
            code, res = _post(base + f"/stream/{sid}",
                              audio[ofs : ofs + 16000].tobytes())
            assert code == 200, res
            toks += res["tokens"]
        code, res = _post(base + f"/stream/{sid}/end", b"")
        assert code == 200, res
        toks += res["tokens"]
        assert toks == offline
        assert res["total_tokens"] == len(offline)

        # the session is gone after /end
        code, res = _post(base + f"/stream/{sid}", b"\x00\x00")
        assert code == 404

        # unknown session and bad params are client errors
        code, _ = _post(base + "/stream/nope", b"\x00\x00")
        assert code == 404
        code, _ = _post(base + "/stream/start?window_s=0.1&overlap_s=0.5", b"")
        assert code == 400
    finally:
        worker.stop()
        server.shutdown()


def test_streaming_response_and_chunked_upload(workdir):
    """?stream=1 returns chunked NDJSON whose concatenated tokens equal
    the offline long-form transcript; chunked request bodies (no
    Content-Length) are decoded server-side."""
    t = Transcriber(workdir)
    rs = np.random.RandomState(7)
    audio = (rs.randn(3 * 16000) * 2000).astype(np.int16)
    expected = t.transcribe_long(
        audio, window_seconds=1.0, overlap_seconds=0.25
    )

    server, worker = make_server(t, "127.0.0.1", 0, max_batch=2)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        url = base + "/transcribe?raw=1&stream=1&window_s=1&overlap_s=0.25"
        req = urllib.request.Request(url, data=audio.tobytes())
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(x) for x in r.read().decode().splitlines()]
        assert lines and lines[-1].get("final") is True
        toks = [tok for ln in lines for tok in ln["tokens"]]
        assert toks == expected
        assert lines[-1]["total_tokens"] == len(toks)
        assert len(lines) > 1  # genuinely incremental (several windows)

        # chunked upload of the same audio through the plain path
        import http.client

        body = audio[: 16000].tobytes()
        ref = t.transcribe(audio[:16000])
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.putrequest("POST", "/transcribe?raw=1")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        for i in range(0, len(body), 10000):
            chunk = body[i : i + 10000]
            conn.send(b"%x\r\n" % len(chunk) + chunk + b"\r\n")
        conn.send(b"0\r\n\r\n")
        resp = conn.getresponse()
        out = json.loads(resp.read())
        assert resp.status == 200 and out["tokens"] == ref
        conn.close()
    finally:
        worker.stop()
        server.shutdown()


def test_replicated_serving(workdir):
    """Transcriber.replicate: each replica pins a full param copy to its
    own device and answers identically; BatchingWorker with a replica
    list work-steals micro-batches off the shared queue."""
    import jax

    t = Transcriber(workdir)
    reps = t.replicate(2)
    assert len(reps) == 2
    devs = [
        next(iter(jax.tree_util.tree_leaves(r.params)[0].devices()))
        for r in reps
    ]
    assert devs[0] != devs[1]

    rs = np.random.RandomState(11)
    pcms = [(rs.randn(8000) * 2000).astype(np.int16) for _ in range(6)]
    expected = [t.transcribe(p) for p in pcms]
    for r in reps:
        assert [r.transcribe(p) for p in pcms] == expected

    server, worker = make_server(reps, "127.0.0.1", 0, max_batch=2,
                                 batch_wait_ms=5.0)
    assert len(worker.replicas) == 2 and worker.t is reps[0]
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = [None] * len(pcms)

        def hit(i):
            code, out = _post(base + "/transcribe?raw=1", pcms[i].tobytes())
            results[i] = (code, out.get("tokens"))

        ths = [threading.Thread(target=hit, args=(i,)) for i in range(len(pcms))]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        assert results == [(200, e) for e in expected]
    finally:
        worker.stop()
        server.shutdown()


def test_malformed_chunked_body_is_clean_400(workdir):
    """A chunked upload with a garbage size line must produce a clean
    400 (not a stack trace / connection reset), and responses advertise
    HTTP/1.1 (chunked NDJSON responses are illegal on a 1.0 status
    line — RFC 7230 §3.3.1)."""
    import http.client

    t = Transcriber(workdir)
    server, worker = make_server(t, "127.0.0.1", 0, max_batch=2)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.putrequest("POST", "/transcribe?raw=1")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"NOT_HEX\r\ngarbage\r\n0\r\n\r\n")
        resp = conn.getresponse()
        assert resp.status == 400
        assert resp.version == 11  # HTTP/1.1 status line
        assert "bad body" in json.loads(resp.read())["error"]
        conn.close()

        # size line longer than the cap: same clean 400
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.putrequest("POST", "/transcribe?raw=1")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.endheaders()
        conn.send(b"10;" + b"x" * 2000 + b"\r\n")
        resp = conn.getresponse()
        assert resp.status == 400
        conn.close()

        # unknown POST paths never leak the raw path into metric labels
        code, _ = _post(f"http://127.0.0.1:{port}/attack\"path", b"x")
        assert code == 404
        import urllib.request as _ur

        with _ur.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=60) as r:
            body = r.read().decode()
        assert 'endpoint="other"' in body
        assert "attack" not in body
    finally:
        worker.stop()
        server.shutdown()
