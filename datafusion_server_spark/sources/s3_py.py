"""Pure-Python S3 REST client (SigV4) — the no-jar fallback for A7's
object-store listing reads.

The reference reads object stores through the rust ``object_store``
crate (lib/src/data_source/object_store/reader.rs:14-134) with
credentials from its credential manager. The Spark-primary path here is
hadoop-aws (``s3a://`` listing scans, full pushdown); this module makes
a configured S3/MinIO storage EXECUTE when that jar is absent:

- AWS Signature Version 4 from the public spec (canonical request ->
  string-to-sign -> HMAC-SHA256 signing-key chain), stdlib ``hmac`` only;
- ListObjectsV2 with continuation-token pagination (ElementTree XML);
- GetObject byte fetch;
- credentials resolve from the SAME Hadoop configuration keys
  ``credentials.configure_s3`` writes (bucket-scoped
  ``fs.s3a.bucket.<b>.*`` first, then global ``fs.s3a.*``) — one config
  source for both paths, exactly the reference's credential-manager
  shape.

The fallback STAGES matched objects to local disk and reads the staged
copy with the normal Spark reader — a driver-side transfer bounded by
what you point it at (dimension/config-table scale); big data belongs on
the jar-backed distributed scan. Same contract as the avro/delta/pgwire
fallbacks: config-complete features execute somewhere real instead of
waiting for a jar.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import os
import urllib.request
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from urllib.parse import quote, urlparse


class S3Error(RuntimeError):
    pass


@dataclass(frozen=True)
class S3Config:
    access_key: str
    secret_key: str
    endpoint: str | None = None  # None -> AWS default virtual-host style
    region: str = "us-east-1"
    path_style: bool = False


def config_from_hadoop(spark, bucket: str) -> S3Config:
    """Resolve credentials/endpoint from the Hadoop conf keys
    ``credentials.configure_s3`` sets (bucket-scoped overrides global)."""
    h = spark.sparkContext._jsc.hadoopConfiguration()

    def get(suffix: str) -> str | None:
        v = h.get(f"fs.s3a.bucket.{bucket}.{suffix}")
        return v if v is not None else h.get(f"fs.s3a.{suffix}")

    access, secret = get("access.key"), get("secret.key")
    if not access or not secret:
        raise S3Error(
            f"no S3 credentials configured for bucket {bucket!r} "
            "(configure_s3 / [[storages]] sets fs.s3a.*.access.key)"
        )
    endpoint = get("endpoint")
    if endpoint and not endpoint.startswith(("http://", "https://")):
        endpoint = f"https://{endpoint}"
    return S3Config(
        access_key=access,
        secret_key=secret,
        endpoint=endpoint,
        region=get("endpoint.region") or "us-east-1",
        path_style=(get("path.style.access") or "").lower() == "true",
    )


def _sign(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def _signing_key(secret: str, datestamp: str, region: str) -> bytes:
    k = _sign(f"AWS4{secret}".encode(), datestamp)
    k = _sign(k, region)
    k = _sign(k, "s3")
    return _sign(k, "aws4_request")


def _uri_encode(s: str, *, encode_slash: bool) -> str:
    safe = "-._~" if encode_slash else "-._~/"
    return quote(s, safe=safe)


def _request(
    cfg: S3Config,
    bucket: str,
    key: str,
    query: dict[str, str],
    *,
    now: datetime.datetime | None = None,
) -> bytes:
    """One signed GET; returns the response body or raises S3Error with
    the service's error body."""
    if cfg.endpoint:
        base = urlparse(cfg.endpoint)
        host = base.netloc
        scheme = base.scheme
        path = f"/{bucket}/{key}" if cfg.path_style else f"/{key}"
        if not cfg.path_style:
            host = f"{bucket}.{host}"
    else:
        scheme = "https"
        host = f"{bucket}.s3.{cfg.region}.amazonaws.com"
        path = f"/{key}"
    now = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(b"").hexdigest()
    canonical_uri = _uri_encode(path, encode_slash=False) or "/"
    canonical_query = "&".join(
        f"{_uri_encode(k, encode_slash=True)}={_uri_encode(v, encode_slash=True)}"
        for k, v in sorted(query.items())
    )
    headers = {
        "host": host,
        "x-amz-content-sha256": payload_hash,
        "x-amz-date": amz_date,
    }
    canonical_headers = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
    signed_headers = ";".join(sorted(headers))
    canonical_request = "\n".join(
        ["GET", canonical_uri, canonical_query, canonical_headers, signed_headers,
         payload_hash]
    )
    scope = f"{datestamp}/{cfg.region}/s3/aws4_request"
    string_to_sign = "\n".join(
        ["AWS4-HMAC-SHA256", amz_date, scope,
         hashlib.sha256(canonical_request.encode()).hexdigest()]
    )
    signature = hmac.new(
        _signing_key(cfg.secret_key, datestamp, cfg.region),
        string_to_sign.encode(),
        hashlib.sha256,
    ).hexdigest()
    auth = (
        f"AWS4-HMAC-SHA256 Credential={cfg.access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={signature}"
    )
    url = f"{scheme}://{host}{canonical_uri}"
    if canonical_query:
        url += f"?{canonical_query}"
    req = urllib.request.Request(url, method="GET")
    for k, v in headers.items():
        if k != "host":  # urllib sets Host itself from the URL
            req.add_header(k, v)
    req.add_header("Authorization", auth)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:
        body = e.read().decode(errors="replace")[:500]
        raise S3Error(f"S3 request failed ({e.code}): {body}") from e


def list_objects(cfg: S3Config, bucket: str, prefix: str) -> list[tuple[str, int]]:
    """ListObjectsV2 with pagination -> [(key, size)]."""
    out: list[tuple[str, int]] = []
    token: str | None = None
    while True:
        query = {"list-type": "2", "prefix": prefix}
        if token:
            query["continuation-token"] = token
        body = _request(cfg, bucket, "", query)
        root = ET.fromstring(body)
        ns = ""
        if root.tag.startswith("{"):
            ns = root.tag[: root.tag.index("}") + 1]
        for item in root.findall(f"{ns}Contents"):
            key = item.findtext(f"{ns}Key") or ""
            size = int(item.findtext(f"{ns}Size") or "0")
            if not key.endswith("/"):
                out.append((key, size))
        if (root.findtext(f"{ns}IsTruncated") or "false").lower() == "true":
            token = root.findtext(f"{ns}NextContinuationToken")
            if not token:
                raise S3Error("truncated listing without a continuation token")
        else:
            return out


def get_object(cfg: S3Config, bucket: str, key: str) -> bytes:
    return _request(cfg, bucket, key, {})


def stage_prefix(
    spark, location: str, dest_root: str, *, max_bytes: int = 256 * 1024 * 1024
) -> str:
    """Download every object under ``s3://bucket/prefix`` into a local
    staging dir (flat, path-safe names) and return that dir. Refuses
    beyond ``max_bytes`` — the fallback is for dimension-scale data; a
    bigger read needs the jar-backed distributed scan."""
    u = urlparse(location)
    bucket = u.netloc
    prefix = u.path.lstrip("/")
    cfg = config_from_hadoop(spark, bucket)
    objects = list_objects(cfg, bucket, prefix)
    if not objects:
        raise S3Error(f"no objects under {location!r}")
    total = sum(size for _, size in objects)
    if total > max_bytes:
        raise S3Error(
            f"{location!r} holds {total} bytes — beyond the {max_bytes}-byte "
            "staging fallback; install hadoop-aws for the distributed scan"
        )
    # dir name = readable tail + hash of the FULL (bucket, prefix) so
    # distinct prefixes never collide; cleared before staging so a
    # changed S3 prefix can't leave phantom stale files behind
    import shutil

    digest = hashlib.sha256(f"{bucket}/{prefix}".encode()).hexdigest()[:16]
    tail = (prefix.replace("/", "_") or "_root")[-48:]
    dest = os.path.join(dest_root, bucket, f"{tail}.{digest}")
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    for i, (key, _) in enumerate(objects):
        data = get_object(cfg, bucket, key)
        # index prefix guarantees uniqueness even when flattening '/'
        # collides ('a/b' vs 'a__b'); original basename keeps extensions
        fname = f"{i:05d}__{os.path.basename(key) or 'object'}"
        with open(os.path.join(dest, fname), "wb") as fh:
            fh.write(data)
    return dest
