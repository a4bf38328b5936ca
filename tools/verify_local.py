#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in
DuckDB with views over <sfDir>/*.parquet, sorts columns by name, and
compares row-by-row. Reports per-query PASS/FAIL with the first diff.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # match driver-style value hashing: stringify everything.
    # None and float NaN are the SAME null token: pyarrow renders a
    # null bool/object cell as None where duckdb fetchdf renders NaN —
    # the driver passes those queries (all green in r20), so the two
    # null spellings must compare equal here too.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NULL" if v != v else repr(v)
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            # Read the Spark side via pyarrow, NOT duckdb read_parquet:
            # duckdb coerces decimal128 to float64 exactly like the
            # oracle side, hiding the rendering divergence the driver's
            # comparator sees (VERDICT r20 #3 — the r20 digest
            # regression shipped because this tool read both sides
            # through duckdb). pyarrow preserves decimal/int types so
            # stringification here matches the driver's.
            # date_as_object=False: DATE columns land as datetime64 on
            # both sides (DuckDB fetchdf does the same), mirroring the
            # driver's passing behaviour for the many date-output
            # queries; decimals and ints keep their pyarrow types.
            ours = pd.concat(
                [pq.read_table(f).to_pandas(date_as_object=False)
                 for f in files],
                ignore_index=True)
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        ours = ours[sorted(ours.columns)]
        ref = ref[sorted(ref.columns)]
        if list(ours.columns) != list(ref.columns):
            print(f"FAIL {name}: columns {list(ours.columns)} vs {list(ref.columns)}")
            n_fail += 1
            continue
        # Driver-faithful normalization: the driver sort_values's every
        # column before hashing. An array-typed column makes pandas
        # raise TypeError (unhashable numpy.ndarray) — that is a driver
        # FAIL, so it must be a local FAIL too (r4's llm_vector_quant
        # escaped precisely because this step was missing).
        try:
            ours = ours.sort_values(by=list(ours.columns),
                                    kind="mergesort").reset_index(drop=True)
            ref = ref.sort_values(by=list(ref.columns),
                                  kind="mergesort").reset_index(drop=True)
        except TypeError as e:
            print(f"FAIL {name}: driver-style sort failed "
                  f"(array-typed column in oracled output?): {e}")
            n_fail += 1
            continue
        if len(ours) != len(ref):
            print(f"FAIL {name}: rows {len(ours)} vs {len(ref)}")
            n_fail += 1
            continue
        ok = True
        o_rows = ours.itertuples(index=False, name=None)
        r_rows = ref.itertuples(index=False, name=None)
        for i, (a, b) in enumerate(zip(o_rows, r_rows)):
            na, nb = tuple(map(norm, a)), tuple(map(norm, b))
            if na != nb:
                print(f"FAIL {name}: row {i} differs\n  ours: {na}\n  ref : {nb}")
                ok = False
                n_fail += 1
                break
        if ok:
            # Type-class mismatch is a FAIL, not a warning (VERDICT
            # r20 #3): a numerically equal value rendered by a
            # different type class (decimal vs float, int vs float)
            # splits the driver's stringifying comparator even when
            # every norm()'d value above happened to agree here.
            def tclass(t):
                s = str(t)
                if s.startswith(("int", "uint")):
                    return "int"
                if s.startswith("float"):
                    return "float"
                # unit differences (datetime64[ms]/[ns]/[us]) stringify
                # identically and pass the driver — one class
                if s.startswith("datetime64"):
                    return "datetime"
                return s
            mism = [(c, str(a), str(b))
                    for c, a, b in zip(ours.columns, ours.dtypes, ref.dtypes)
                    if tclass(a) != tclass(b)]
            if mism:
                print(f"FAIL {name}: dtype class mismatch {mism}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(ours)} rows)")
                n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(oracle) - n_pass - n_fail} skipped ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
