"""Serving CLI: micro-batching HTTP transcription server.

The reference has no serving layer at all (SURVEY.md §2: "no serving
layer … the runtime is TF1's session executor used as a black box");
this is the production front door for the TPU-native stack. Requests
are collected into micro-batches so the chip always sees batched work —
the single-utterance path would waste >60× of the measured batch-64
throughput (docs/PERF.md) — and one ``Transcriber`` (one set of compiled
programs) serves every request.

    python -m phones_las_tpu.cli.serve --workdir runs/ls --port 8080

    POST /transcribe    body = a WAV/FLAC/SPHERE/MP3 file, or raw int16
                        PCM with ``?raw=1&rate=16000``
                        → {"tokens": [...], "utt_seconds": ...}
    GET  /healthz       → {"status": "ok", "vocab_size": ..., ...}

Stdlib-only (ThreadingHTTPServer); each request thread enqueues its PCM
and waits; a single worker drains the queue every ``--batch-wait-ms``
(or as soon as ``--max-batch`` is queued) and answers the whole batch
with one device dispatch.
"""

from __future__ import annotations

import argparse
import json
import queue
import tempfile
import threading
from typing import List, Optional

import numpy as np


class _Pending:
    __slots__ = ("pcm", "event", "result", "error")

    def __init__(self, pcm: np.ndarray):
        self.pcm = pcm
        self.event = threading.Event()
        self.result: Optional[List[str]] = None
        self.error: Optional[str] = None


class BatchingWorker:
    """Collects pending requests into micro-batches and transcribes each
    batch with one device dispatch."""

    def __init__(self, transcriber, max_batch: int = 16,
                 batch_wait_ms: float = 20.0):
        self.t = transcriber
        self.max_batch = max_batch
        self.wait_s = batch_wait_ms / 1000.0
        self.q: "queue.Queue[_Pending]" = queue.Queue()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._stop = False
        self._thread.start()

    def submit(self, pcm: np.ndarray) -> _Pending:
        p = _Pending(pcm)
        self.q.put(p)
        return p

    def stop(self):
        self._stop = True

    def _drain(self) -> List[_Pending]:
        import time

        batch = [self.q.get()]  # block for the first request
        deadline = time.monotonic() + self.wait_s
        try:
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                batch.append(self.q.get(timeout=remaining))
        except queue.Empty:
            pass
        return batch

    def _run(self):
        while not self._stop:
            try:
                batch = self._drain()
            except Exception:
                continue
            try:
                # pad to a fixed batch size so one compiled program (per
                # pad quantum) serves all traffic — otherwise every
                # distinct request count would trigger an XLA compile
                pcms = [p.pcm for p in batch]
                pad_rows = self.max_batch - len(pcms)
                if pad_rows > 0:
                    pcms += [np.zeros(1600, np.int16)] * pad_rows
                results = self.t.transcribe_batch(pcms)
                for p, r in zip(batch, results):
                    p.result = r
            except Exception as e:  # answer the whole batch with the error
                for p in batch:
                    p.error = f"{type(e).__name__}: {e}"
            for p in batch:
                p.event.set()


def make_server(transcriber, host: str, port: int, *, max_batch: int = 16,
                batch_wait_ms: float = 20.0, head: str = "phone"):
    """→ (ThreadingHTTPServer, BatchingWorker). ``serve_forever()`` to run."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from phones_las_tpu.data.audio_io import read_audio

    worker = BatchingWorker(transcriber, max_batch, batch_wait_ms)
    sample_rate = transcriber._sample_rate

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {
                    "status": "ok",
                    "vocab_size": len(transcriber.vocab.tokens),
                    "head": head,
                    "sample_rate": sample_rate,
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            from urllib.parse import parse_qs, urlparse

            url = urlparse(self.path)
            if url.path != "/transcribe":
                return self._json(404, {"error": "not found"})
            qs = parse_qs(url.query)
            n = int(self.headers.get("Content-Length", 0))
            if n <= 0:
                return self._json(400, {"error": "empty body"})
            data = self.rfile.read(n)
            try:
                if qs.get("raw", ["0"])[-1] == "1":
                    pcm = np.frombuffer(data, np.int16)
                    rate = int(qs.get("rate", [sample_rate])[-1])
                    if rate != sample_rate:
                        from phones_las_tpu.data.audio_io import resample

                        pcm = resample(pcm, rate, sample_rate)
                else:
                    # the native decoders dispatch on file content
                    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
                        f.write(data)
                        f.flush()
                        pcm, rate = read_audio(f.name, target_rate=sample_rate)
            except Exception as e:
                return self._json(400, {"error": f"decode failed: {e}"})
            if pcm.size == 0:
                return self._json(400, {"error": "no samples"})
            p = worker.submit(pcm)
            p.event.wait()
            if p.error is not None:
                return self._json(500, {"error": p.error})
            self._json(200, {
                "tokens": p.result,
                "utt_seconds": round(pcm.shape[0] / sample_rate, 3),
            })

    class Server(ThreadingHTTPServer):
        # stdlib default backlog is 5: a burst of concurrent clients
        # (the whole point of a batching server) gets connection resets
        # at the accept queue before the handler ever runs
        request_queue_size = 512
        daemon_threads = True

    return Server((host, port), Handler), worker


def main(argv=None):
    from phones_las_tpu.cli.common import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--max-batch", type=int, default=16,
                   help="micro-batch cap per device dispatch")
    p.add_argument("--batch-wait-ms", type=float, default=20.0,
                   help="how long to hold a batch open for more requests")
    p.add_argument("--beam-width", type=int, default=None)
    p.add_argument("--head", default="phone", choices=["phone", "grapheme"])
    p.add_argument("--implementation", default="auto",
                   choices=["auto", "xla", "pallas"])
    args = p.parse_args(argv)

    from phones_las_tpu.api import Transcriber

    t = Transcriber(
        args.workdir, beam_width=args.beam_width, head=args.head,
        implementation=args.implementation,
    )
    # compile the program the worker actually dispatches (a full
    # max_batch micro-batch at the smallest pad quantum) so the first
    # real request doesn't pay the XLA compile
    t.transcribe_batch([np.zeros(16000, np.int16)] * args.max_batch)
    server, _ = make_server(
        t, args.host, args.port, max_batch=args.max_batch,
        batch_wait_ms=args.batch_wait_ms, head=args.head,
    )
    print(f"serving {args.workdir} on {args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.batch_wait_ms}ms)")
    server.serve_forever()


if __name__ == "__main__":
    main()
