"""Multi-column joins: named columns of any dtype, four join modes,
u64 and composite keys -- the engine core stays (u32, u32).

python examples/dataframe_style.py
"""

import numpy as np

import hash_join_codes_knl_tpu as hjk


def main():
    rng = np.random.default_rng(7)
    n_items, n_sales = 4096, 20000
    item_id = np.unique(rng.integers(1, 2**32, n_items * 2,
                                     dtype=np.uint32))[:n_items]
    items = {
        "price": rng.random(n_items) * 100.0,          # float64
        "category": rng.integers(0, 8, n_items, dtype=np.int8),
    }
    sale_item = item_id[rng.integers(0, n_items, n_sales)].astype(np.uint32)
    # a few sales reference unknown items (exercise left/anti)
    sale_item[: n_sales // 10] = rng.integers(1, 2**32, n_sales // 10,
                                              dtype=np.uint32)
    sales = {
        "qty": rng.integers(1, 9, n_sales, dtype=np.int16),
        "day": rng.integers(0, 365, n_sales, dtype=np.int32),
    }

    # inner: one output row per matching (sale, item) pair
    out, _ = hjk.join_columns(item_id, items, sale_item, sales)
    print("inner:", {k: v.dtype.name for k, v in out.items()},
          len(out["qty"]), "rows")

    # left / semi / anti
    left, _ = hjk.join_columns(item_id, items, sale_item, sales,
                               how="left", left_fill=0)
    anti, _ = hjk.join_columns(item_id, items, sale_item, sales,
                               how="anti")
    print(f"left rows={len(left['qty'])} unknown-item sales="
          f"{len(anti['qty'])}")

    # composite key: join on (category-of-sale, day-bucket) style tuples
    ikc = (items["category"], (item_id & 0xFFFF).astype(np.int32))
    okc = (rng.integers(0, 8, n_sales, dtype=np.int8),
           (sale_item & 0xFFFF).astype(np.int32))
    comp, _ = hjk.join_columns_multi(ikc, items, okc, sales, how="semi")
    print("composite semi rows:", len(comp["qty"]))


if __name__ == "__main__":
    main()
