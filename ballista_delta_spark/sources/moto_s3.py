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

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=port, verbose=False)
    server.start()
    # moto only reports the bound port through the underlying werkzeug
    # server — required for port=0 (ephemeral).
    bound = server._server.socket.getsockname()[1]
    return server, f"http://127.0.0.1:{bound}"


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
