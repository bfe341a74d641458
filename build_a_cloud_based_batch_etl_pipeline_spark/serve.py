"""HTTP service surface: the reference's Cloud Function handlers as a
stdlib ``http.server`` app over the same job steps (VERDICT r6 item 7 —
literal R8 parity, not just the CLI analog).

Reference behavior mirrored exactly (src/extract/main.py:57-76,
src/load/main.py:58-84):

- ``POST /extract`` — run the extract step; body ignored (the reference
  handler reads nothing from the request). 200 with
  ``{"success": true, "message": ..., "file": ...}`` or 500 with
  ``{"success": false, "error": ...}``.
- ``POST /load`` — expects the Cloud-Pub/Sub-style envelope the
  reference's storage trigger delivers::

      {"message": {"data": base64(json({"bucket": ..., "name": ...}))}}

  ``bucket`` maps to the landing root URI and ``name`` to the landed
  object below it (the engine is object-store-agnostic: any Hadoop
  filesystem URI works as ``bucket``). 200 on success, 400 with
  ``{"success": false, "error": "Invalid request format"}`` when the
  envelope is missing/malformed (reference returns exactly this), 500
  when the load itself fails.
- ``POST /pipeline`` — one full tick (extract then load); engine
  extension with the same envelope contract.

No flask / functions_framework: the sandbox ships neither, and a
scheduled-batch engine needs ~60 lines of stdlib routing, not a web
framework. The Spark session is created once at server start (JVM
spin-up must not be paid per request) and shared across requests —
requests are serialized by the single-threaded HTTPServer, matching the
one-tick-at-a-time cron semantics.
"""

from __future__ import annotations

import base64
import json
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Any, Callable

from pyspark.sql import SparkSession

from . import ingest, job
from .config import IngestConfig


def _parse_pubsub_envelope(body: bytes) -> tuple[str, str] | None:
    """Extract (bucket, name) from a Pub/Sub push envelope; None if the
    format is invalid — which the handler maps to the reference's 400."""
    try:
        request_json = json.loads(body.decode("utf-8"))
        pubsub_message = request_json["message"]
        event = json.loads(
            base64.b64decode(pubsub_message["data"]).decode("utf-8")
        )
        return str(event["bucket"]), str(event["name"])
    except Exception:
        return None


def make_handler(
    spark: SparkSession,
    cfg: IngestConfig,
    fetcher: ingest.Fetcher | None = None,
) -> type[BaseHTTPRequestHandler]:
    """Build the request-handler class bound to one Spark session and
    config (the test injects a fake fetcher the same way job tests do)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args: Any) -> None:  # quiet test output
            pass

        def _reply(self, status: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _run(self, step: Callable[[], dict]) -> None:
            envelope = step()
            self._reply(200 if envelope.get("success") else 500, envelope)

        def do_POST(self) -> None:  # noqa: N802 (http.server contract)
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            if self.path == "/extract":
                self._run(lambda: job.run_extract(spark, cfg, fetcher=fetcher))
            elif self.path == "/pipeline":
                self._run(lambda: job.run_pipeline(spark, cfg, fetcher=fetcher))
            elif self.path == "/load":
                parsed = _parse_pubsub_envelope(body)
                if parsed is None:
                    # reference src/load/main.py:82 — malformed trigger
                    # payload is a 400, not a 500
                    self._reply(
                        400,
                        {"success": False, "error": "Invalid request format"},
                    )
                    return
                bucket, name = parsed
                self._run(
                    lambda: job.run_load(
                        spark, cfg, landing_path=f"{bucket}/{name}"
                    )
                )
            else:
                self._reply(
                    400, {"success": False, "error": "Invalid request format"}
                )

    return Handler


def serve(
    host: str = "127.0.0.1",
    port: int = 8080,
    cfg: IngestConfig | None = None,
) -> HTTPServer:
    """Start the service (blocking). Returns only via KeyboardInterrupt."""
    from .session import get_spark

    spark = get_spark("etl-http")
    server = HTTPServer((host, port), make_handler(spark, cfg or IngestConfig()))
    server.serve_forever()
    return server


if __name__ == "__main__":
    serve()
