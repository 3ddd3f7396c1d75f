"""Text-analysis Ray Data stages: quality columns, language ID, and
document fingerprints as zero-copy Arrow ``map_batches`` transforms."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from doppel_ray.functions import analysis as A


def add_quality_columns(
    ds: Dataset, text_col: str = "text", batch_size: int = 4096
) -> Dataset:
    """Append n_chars/n_bytes/n_tokens/n_punct/punct_ratio/mean_token_len/
    stopword_ratio/quality columns (all vectorized RE2/numpy)."""

    def fn(batch: pa.Table) -> pa.Table:
        feats = A.quality_features(batch[text_col])
        feats["quality"] = A.quality_score(feats)
        for name, arr in feats.items():
            if name in batch.column_names:
                batch = batch.drop_columns([name])
            batch = batch.append_column(name, pa.array(arr))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def add_lang_id(
    ds: Dataset,
    text_col: str = "text",
    out_col: str = "lang_pred",
    batch_size: int = 4096,
) -> Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        pred = A.lang_id(batch[text_col])
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, pa.array(pred, type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def add_fingerprints(
    ds: Dataset,
    text_col: str = "text",
    out_col: str = "fingerprint",
    w: int = 16,
    batch_size: int = 4096,
) -> Dataset:
    """Winnowing-style min-window-hash fingerprint column (int64 view)."""

    def fn(batch: pa.Table) -> pa.Table:
        fp = A.doc_fingerprints(batch[text_col], w=w).view(np.int64)
        if out_col in batch.column_names:
            batch = batch.drop_columns([out_col])
        return batch.append_column(out_col, pa.array(fp, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
