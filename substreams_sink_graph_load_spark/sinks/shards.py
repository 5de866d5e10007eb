"""Physical training-shard writers: packed token shards and WebDataset tars.

The registry's curation surface ends at LOGICAL shard assignment
(``operators/curate.py``: shard = content-hash % n_shards, parquet export
via ``partitionBy``).  Trainers don't read parquet — they mmap packed
token binaries (the Megatron-LM / nanoGPT ``.bin``/``.idx`` layout) or
stream WebDataset tar shards.  This module writes both.

100 TB shape: ONE exchange on the shard key (``groupBy(shard)``), then
every shard serializes independently inside its own task —
embarrassingly parallel, no further shuffle, and the shard count set
upstream (``curate(n_shards=...)``) is the file-size knob.  Each writer
returns a manifest DataFrame (counts + sha256 per shard) computed from
the bytes actually written, so an export is auditable without trusting
the writer: re-hash the files and compare.

Byte determinism is a contract, not an accident: sequences are sorted by
id inside each shard before packing, tar metadata is pinned (mtime=0,
uid/gid=0, fixed mode), and tokens serialize little-endian — the same
logical corpus produces bit-identical shards regardless of input
partitioning, so the sha256 manifest is reproducible end-to-end (tests
repartition and re-write to prove it).

Paths: ``out_dir`` must be visible to executors (local dir in local
mode, shared/object storage on a cluster — same rule as any Spark sink).

Memory: ``applyInPandas`` materializes each shard's rows in its task, so
per-task memory is O(shard bytes) — upstream ``n_shards`` is therefore
both the file-size AND the executor-memory knob (pick shards that fit,
exactly as a tar/tfrecord exporter sizes its output files).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_split

_IDX_MAGIC = np.int64(0x53474C544F4B3031)  # "SGLTOK01"


def hash_tokenize(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 32768,
    out_col: str = "tokens",
) -> DataFrame:
    """Deterministic stand-in tokenizer: BPE-ish regex split
    (:func:`..functions.text.token_split`) then ``pmod(xxhash64(token),
    vocab_size)`` — pure JVM codegen (no Python in the scan), portable
    across runs/engines, and id-bounded so the caller can pick the
    narrowest shard dtype.  A real exporter swaps in its BPE vocab at
    this one column; everything downstream (packing, sharding,
    manifests) is tokenizer-agnostic."""
    toks = token_split(F.col(text_col))
    ids = F.transform(
        toks, lambda w: F.pmod(F.xxhash64(w), F.lit(vocab_size)).cast("int")
    )
    return df.withColumn(out_col, ids)


def write_token_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard",
    seq_col: str = "doc_id",
    tokens_col: str = "tokens",
    dtype: str = "uint16",
) -> DataFrame:
    """Write one packed ``shard_NNNNN.bin`` + ``.idx`` per shard.

    ``.bin`` is the concatenation of every sequence's token ids as
    little-endian ``dtype`` (mmap-ready); ``.idx`` is int64:
    ``[magic, n_seqs, seq_id..., end_offset...]`` — end offsets are
    cumulative token counts, so sequence *i* spans
    ``bin[end[i-1]:end[i]]`` and loaders can random-access without
    scanning.  Sequences sort by ``seq_col`` inside the shard, so bytes
    are partitioning-independent.

    Returns the manifest: ``(shard, n_seqs, n_tokens, sha256_bin,
    sha256_idx)``.  Raises inside the task if any token id overflows
    ``dtype`` (a silent wrap would corrupt training data undetectably).
    """
    np_dtype = np.dtype(dtype)
    if np_dtype.kind not in "ui":
        raise ValueError(f"token dtype must be integral, got {dtype}")
    limit = int(np.iinfo(np_dtype).max)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col)
        shard = int(pdf[shard_col].iloc[0])
        null_mask = pdf[tokens_col].isna()
        if null_mask.any():
            bad = pdf.loc[null_mask, seq_col].tolist()[:5]
            raise ValueError(
                f"NULL {tokens_col} in shard {shard} for {seq_col}s "
                f"{bad}{'...' if null_mask.sum() > 5 else ''} — "
                "filter or fillna upstream (a null sequence has no "
                "defined byte representation)"
            )
        seqs = [np.asarray(t, dtype=np.int64) for t in pdf[tokens_col]]
        flat = (
            np.concatenate(seqs) if seqs else np.empty(0, dtype=np.int64)
        )
        if len(flat) and (flat.min() < 0 or flat.max() > limit):
            raise ValueError(
                f"token id outside {dtype} range in shard {shard}: "
                f"[{flat.min()}, {flat.max()}] vs [0, {limit}]"
            )
        bin_bytes = flat.astype(np_dtype.newbyteorder("<")).tobytes()
        ends = np.cumsum([len(s) for s in seqs], dtype=np.int64)
        idx = np.concatenate(
            [
                [_IDX_MAGIC, np.int64(len(seqs))],
                pdf[seq_col].to_numpy(dtype=np.int64),
                ends,
            ]
        ).astype("<i8")
        idx_bytes = idx.tobytes()
        os.makedirs(out_dir, exist_ok=True)
        base = os.path.join(out_dir, f"shard_{shard:05d}")
        with open(base + ".bin", "wb") as f:
            f.write(bin_bytes)
        with open(base + ".idx", "wb") as f:
            f.write(idx_bytes)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_seqs": [len(seqs)],
                "n_tokens": [int(ends[-1]) if len(ends) else 0],
                "sha256_bin": [hashlib.sha256(bin_bytes).hexdigest()],
                "sha256_idx": [hashlib.sha256(idx_bytes).hexdigest()],
            }
        )

    return (
        df.select(shard_col, seq_col, tokens_col)
        .groupBy(shard_col)
        .applyInPandas(
            write_shard,
            "shard long, n_seqs long, n_tokens long, "
            "sha256_bin string, sha256_idx string",
        )
    )


def read_token_shard(base_path: str) -> list[tuple[int, np.ndarray]]:
    """Load ``base_path{.bin,.idx}`` back as ``[(seq_id, tokens)]`` —
    the loader-side counterpart used by the round-trip tests (and a
    reference for wiring a real data loader)."""
    idx = np.fromfile(base_path + ".idx", dtype="<i8")
    if idx[0] != _IDX_MAGIC:
        raise ValueError(f"bad idx magic in {base_path}.idx")
    n = int(idx[1])
    seq_ids, ends = idx[2 : 2 + n], idx[2 + n : 2 + 2 * n]
    # dtype is not self-describing in the Megatron layout; infer from size
    n_tokens = int(ends[-1]) if n else 0
    raw = np.fromfile(base_path + ".bin", dtype=np.uint8)
    width = len(raw) // n_tokens if n_tokens else 2
    flat = raw.view(f"<u{width}")
    out, prev = [], 0
    for sid, end in zip(seq_ids, ends):
        out.append((int(sid), flat[prev:end].copy()))
        prev = int(end)
    return out


def _member_bytes(val, key, ext) -> bytes:
    """Serialize one tar-member value with no silent-corruption path:
    strings utf-8, binary raw, scalars as ASCII text (the WebDataset
    convention for .cls-style members — ``bytes(5)`` would be five NUL
    bytes, which is exactly the corruption this refuses), None rejected
    loudly."""
    if isinstance(val, str):
        return val.encode("utf-8")
    if isinstance(val, (bytes, bytearray)):
        return bytes(val)
    if isinstance(val, (bool, np.bool_)):
        return (b"1" if val else b"0")
    if isinstance(val, (int, float, np.integer, np.floating)):
        return repr(val if not isinstance(val, np.generic) else val.item()).encode("ascii")
    if val is None:
        raise ValueError(
            f"NULL member value for entry {key}.{ext} — filter or fillna "
            "upstream"
        )
    raise TypeError(
        f"unsupported member type {type(val).__name__} for entry "
        f"{key}.{ext}: expected str, bytes, or a numeric scalar"
    )


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    members: dict[str, str],
    shard_col: str = "shard",
    key_col: str = "doc_id",
) -> DataFrame:
    """Write one WebDataset-layout ``shard_NNNNN.tar`` per shard.

    ``members`` maps tar-entry extension -> source column: each row
    becomes entries ``{key}.{ext}`` (integer keys zero-padded to 12 so
    lexicographic order is numeric order, string keys verbatim; string
    columns utf-8 encoded, binary columns raw — the multimodal payload
    path), grouped by key as WebDataset requires.  Entries sort by (key, ext) and tar metadata is
    pinned (mtime=0, uid/gid=0, mode 0644), so shard bytes — and the
    manifest sha256 — are partitioning-independent.

    Returns the manifest: ``(shard, n_keys, n_bytes, sha256)``.
    """
    exts = sorted(members)

    def fmt_key(key) -> str:
        # zero-pad integer keys for lexicographic == numeric order;
        # string keys (e.g. content hashes) pass through verbatim
        return f"{key:012d}" if isinstance(key, (int, np.integer)) else str(key)

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col)
        shard = int(pdf[shard_col].iloc[0])
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in pdf.iterrows():
                key = fmt_key(row[key_col])
                for ext in exts:
                    val = row[members[ext]]
                    data = _member_bytes(val, key, ext)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(data)
                    info.mtime = 0
                    info.uid = info.gid = 0
                    info.uname = info.gname = ""
                    info.mode = 0o644
                    tar.addfile(info, io.BytesIO(data))
        payload = buf.getvalue()
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"shard_{shard:05d}.tar")
        with open(path, "wb") as f:
            f.write(payload)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_keys": [len(pdf)],
                "n_bytes": [len(payload)],
                "sha256": [hashlib.sha256(payload).hexdigest()],
            }
        )

    cols = [shard_col, key_col] + sorted(set(members.values()))
    return (
        df.select(*cols)
        .groupBy(shard_col)
        .applyInPandas(
            write_shard,
            "shard long, n_keys long, n_bytes long, sha256 string",
        )
    )
