"""Source readers with the row-id contract.

``row_order`` (the global input position that makes the order-sensitive
linkage reproducible, SURVEY §2.8) is a METADATA property of the source:
global offsets come from Parquet footers (file order × row-group row
counts), never from materializing data. This replaces the round-1
``attach_global_order`` order-preserving full materialize — the scale
killer VERDICT.md ranked #1 — with a plan-time metadata pass:

  * driver reads only footers (one per file — the planning cost every
    engine pays) and emits (file, row_group, offset) work items;
  * one Ray task per row group reads its rows with ``columns`` pruning and
    attaches ``row_order = offset + arange(n)``;
  * downstream stages carry the column; block completion order is free to
    vary (no ``preserve_order`` throttling anywhere).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _plan_row_groups(paths) -> list[dict]:
    """Footer-only planning: deterministic (sorted file, row-group) order
    with cumulative global offsets."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    ds = pads.dataset(paths, format="parquet")
    items: list[dict] = []
    offset = 0
    for path in sorted(ds.files):
        md = pq.ParquetFile(path).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            items.append({"path": path, "row_group": rg, "offset": offset})
            offset += n
    return items


def read_parquet_with_row_order(paths, columns: list[str] | None = None):
    """``ray.data.read_parquet`` + a source-derived ``row_order`` column.

    Returns a streaming Dataset; nothing is materialized. ``columns``
    prunes at the read (row-group projection)."""
    import ray.data as rd

    items = _plan_row_groups(paths)
    cols = list(columns) if columns is not None else None

    def read_items(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        tables = []
        for path, rg, off in zip(
            batch["path"].to_pylist(),
            batch["row_group"].to_pylist(),
            batch["offset"].to_pylist(),
        ):
            t = pq.ParquetFile(path).read_row_group(rg, columns=cols)
            t = t.append_column(
                "row_order",
                pa.array(np.arange(off, off + t.num_rows), type=pa.int64()),
            )
            tables.append(t)
        return pa.concat_tables(tables, promote_options="default")

    items_ds = rd.from_items(items, override_num_blocks=max(1, len(items)))
    # batch_size=None -> one map task per block (= per row group)
    return items_ds.map_batches(
        read_items, batch_format="pyarrow", batch_size=None
    )


def entities_with_source_order(
    ds_path_or_paths,
    text_col: str,
    block_col: str | None,
    columns: list[str] | None = None,
):
    """Read a parquet source straight into the entities schema
    (row_order, entity_text, block_key) with source-derived order — the
    zero-materialization replacement for ``dataset_with_row_order`` when
    the input is parquet on storage."""
    from raylink.pipeline import ALL_BLOCK

    need = [text_col] + ([block_col] if block_col else [])
    ds = read_parquet_with_row_order(
        ds_path_or_paths, columns=columns or need
    )

    def prep(batch: pa.Table) -> pa.Table:
        out = {
            "row_order": batch["row_order"],
            "entity_text": batch[text_col],
        }
        if block_col and block_col in batch.column_names:
            out["block_key"] = batch[block_col]
        else:
            out["block_key"] = pa.array(
                [ALL_BLOCK] * batch.num_rows, type=pa.string()
            )
        return pa.table(out)

    return ds.map_batches(prep, batch_format="pyarrow")
