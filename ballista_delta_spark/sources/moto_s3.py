"""In-process moto S3 endpoint — the docker-free stand-in for the
reference's testcontainers MinIO (reference tests/store.rs:19-70).

Dev/test/demo utility shared by the ``scan_s3`` query, the
``s3_standalone`` example, and the S3 test suite so the
ThreadedMotoServer bootstrap (including the private-attr port discovery
for ``port=0``) lives in exactly one place. Raises ImportError where
moto/boto3 are not installed — callers gate on that.
"""

from __future__ import annotations

from typing import Any


def start_moto_s3(port: int = 0) -> tuple[Any, str]:
    """Start a moto S3 server on localhost; returns (server, endpoint).

    Call ``server.stop()`` when done — or leave it for process exit for
    process-lifetime singletons (the server thread is a daemon).
    """
    from moto.server import ThreadedMotoServer

    if port == 0:
        # Pre-bind a free port ourselves rather than relying on moto's
        # private werkzeug internals (server._server.socket) to report
        # the ephemeral bind — a moto version bump breaking that attr
        # would take scan_s3, the s3_standalone demo, and the S3 suite
        # down with an unrelated AttributeError. The close→reuse window
        # is benign on loopback with SO_REUSEADDR semantics in tests.
        import socket

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=port, verbose=False)
    server.start()
    # Prefer moto's own report of the bound port when the internals are
    # still there (guarded fallback keeps us honest if they move).
    try:
        port = server._server.socket.getsockname()[1]
    except AttributeError:
        pass
    return server, f"http://127.0.0.1:{port}"


def s3_client(endpoint: str):
    """A boto3 client wired to ``endpoint`` with the standard testing
    credentials (moto accepts any)."""
    import boto3

    return boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        region_name="us-east-1",
    )


def upload_tree(client, local_root: str, bucket: str, prefix: str) -> None:
    """PUT every file under ``local_root`` to ``bucket`` as
    ``prefix/<relative path>`` (e.g. mirror a Delta table dir)."""
    import os

    for root, _dirs, names in os.walk(local_root):
        for name in names:
            full = os.path.join(root, name)
            rel = os.path.relpath(full, local_root).replace(os.sep, "/")
            with open(full, "rb") as fh:
                client.put_object(
                    Bucket=bucket, Key=f"{prefix}/{rel}", Body=fh.read()
                )
