"""HTTP serving front-end over the continuous-batching engine.

The reference's only generation surface is HF ``generate`` called in-process
(modeling_bitllama.py:1464-1510 + LMClass._model_generate); it ships no
server.  This module is the deployment surface the engine was built for:

* ``POST /generate`` — body ``{"prompt": [ids...] | "text": str,
  "max_new_tokens": int, "stream": bool}``.  Non-streaming returns one JSON
  object; ``stream: true`` returns newline-delimited JSON chunks
  (``{"token": id}`` per token as it lands, then ``{"done": true, ...}``).
* ``GET /metrics`` — engine counters (tokens/s EMA, queue depth, KV-page
  occupancy) as JSON.
* ``GET /health`` — liveness.

Threading model: stdlib ``ThreadingHTTPServer`` handlers enqueue requests
into the engine under a lock; a single background thread owns every
device dispatch (``engine.step()``), so JAX sees one serialized stream of
work.  Handlers stream tokens from a per-request queue fed by the
engine's ``on_token`` hook.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional


class EngineServer:
    """Drives a ContinuousBatchingEngine from an HTTP front-end."""

    def __init__(self, engine, tokenizer=None, poll_interval: float = 0.005):
        self.engine = engine
        self.tokenizer = tokenizer
        self.poll_interval = poll_interval
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- engine thread ------------------------------------------------------

    def _loop(self):
        while not self._stop.is_set():
            with self._lock:
                has_work = self.engine.has_work()
                if has_work:
                    self.engine.step()
            if not has_work:
                # idle: sleep until a request arrives
                self._wake.wait(timeout=0.1)
                self._wake.clear()

    def submit(self, prompt, max_new_tokens: int,
               on_token: Callable, on_done: Callable) -> int:
        with self._lock:
            uid = self.engine.add_request(prompt,
                                          max_new_tokens=max_new_tokens,
                                          on_token=on_token,
                                          on_done=on_done)
        self._wake.set()
        return uid

    def metrics(self) -> dict:
        with self._lock:
            return self.engine.metrics()

    # -- lifecycle ----------------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start engine thread + HTTP server; returns the bound port."""
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):   # quiet
                pass

            def _json(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/metrics":
                    self._json(200, server.metrics())
                elif self.path == "/health":
                    self._json(200, {"ok": True})
                else:
                    self._json(404, {"error": "unknown path"})

            def do_POST(self):
                if self.path != "/generate":
                    self._json(404, {"error": "unknown path"})
                    return
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(length) or b"{}")
                    if "prompt" in body:
                        prompt = [int(t) for t in body["prompt"]]
                    elif "text" in body and server.tokenizer is not None:
                        prompt = server.tokenizer(body["text"])["input_ids"]
                    else:
                        raise ValueError(
                            "need 'prompt' (token ids) or 'text' "
                            "(requires a server-side tokenizer)")
                    max_new = int(body.get("max_new_tokens", 64))
                    stream = bool(body.get("stream", False))
                except (ValueError, KeyError, json.JSONDecodeError) as e:
                    self._json(400, {"error": str(e)})
                    return

                q: "queue.Queue" = queue.Queue()
                server.submit(prompt, max_new,
                              on_token=lambda t: q.put(("tok", t)),
                              on_done=lambda: q.put(("done", None)))

                toks = []
                if stream:
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/x-ndjson")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def chunk(obj):
                        data = (json.dumps(obj) + "\n").encode()
                        self.wfile.write(hex(len(data))[2:].encode()
                                         + b"\r\n" + data + b"\r\n")

                    while True:
                        kind, tok = q.get()
                        if kind == "done":
                            final = {"done": True, "tokens": toks}
                            if server.tokenizer is not None:
                                final["text"] = server.tokenizer.decode(toks)
                            chunk(final)
                            self.wfile.write(b"0\r\n\r\n")
                            return
                        toks.append(tok)
                        chunk({"token": tok})
                else:
                    while True:
                        kind, tok = q.get()
                        if kind == "done":
                            break
                        toks.append(tok)
                    out = {"tokens": toks}
                    if server.tokenizer is not None:
                        out["text"] = server.tokenizer.decode(toks)
                    self._json(200, out)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        threading.Thread(target=self._httpd.serve_forever,
                         daemon=True).start()
        return self._httpd.server_address[1]

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._httpd is not None:
            self._httpd.shutdown()
        if self._thread is not None:
            self._thread.join(timeout=5)
