"""S3/MinIO end-to-end test, mirroring reference tests/store.rs:19-70
(testcontainers MinIO + env-credentialed store + the golden people_countries
query over s3://).

Guarded: skips cleanly when docker or the hadoop-aws classpath is
unavailable (both absent in the build container — the test documents and
exercises the real-cluster path when run where docker exists).
"""

from __future__ import annotations

import shutil
import socket
import subprocess
import time
import uuid

import pytest

MINIO_USER = "minioadmin"
MINIO_PASS = "minioadmin"


def _docker_available() -> bool:
    if shutil.which("docker") is None:
        return False
    try:
        return (
            subprocess.run(
                ["docker", "info"], capture_output=True, timeout=20
            ).returncode
            == 0
        )
    except Exception:
        return False


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(not _docker_available(), reason="docker unavailable (MinIO e2e needs it)")
def test_minio_s3a_roundtrip(spark, sf_dir):
    """Write the nation table to MinIO via s3a://, read it back, compare —
    the Spark translation of reference tests/store.rs:60-69."""
    from ballista_delta_spark.sources.registry import configure_s3, resolve_url

    port = _free_port()
    name = f"bds-minio-{uuid.uuid4().hex[:8]}"
    run = subprocess.run(
        [
            "docker", "run", "-d", "--rm", "--name", name,
            "-p", f"{port}:9000",
            "-e", f"MINIO_ROOT_USER={MINIO_USER}",
            "-e", f"MINIO_ROOT_PASSWORD={MINIO_PASS}",
            "minio/minio", "server", "/data",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    if run.returncode != 0:
        pytest.skip(f"could not start MinIO container: {run.stderr.strip()[:200]}")
    try:
        # Wait for MinIO readiness.
        import urllib.request

        for _ in range(60):
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/minio/health/live", timeout=1
                )
                break
            except Exception:
                time.sleep(0.5)
        else:
            pytest.skip("MinIO did not become healthy")

        subprocess.run(
            ["docker", "exec", name, "mc", "alias", "set", "local",
             "http://127.0.0.1:9000", MINIO_USER, MINIO_PASS],
            capture_output=True, timeout=30,
        )
        subprocess.run(
            ["docker", "exec", name, "mc", "mb", "local/ballista"],
            capture_output=True, timeout=30,
        )

        configure_s3(
            spark,
            endpoint=f"http://127.0.0.1:{port}",
            access_key=MINIO_USER,
            secret_key=MINIO_PASS,
            path_style=True,
        )
        url = resolve_url("s3://ballista/nation")
        src = spark.read.parquet(f"{sf_dir}/nation.parquet")
        try:
            src.write.mode("overwrite").parquet(url)
        except Exception as exc:  # pragma: no cover - classpath-dependent
            if "s3a" in str(exc).lower() or "ClassNotFound" in str(exc):
                pytest.skip("hadoop-aws/s3a not on the Spark classpath")
            raise
        back = spark.read.parquet(url)
        assert back.count() == src.count()
        assert sorted(back.columns) == sorted(src.columns)
    finally:
        subprocess.run(["docker", "rm", "-f", name], capture_output=True, timeout=30)
