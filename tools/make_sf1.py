#!/usr/bin/env python3
"""Build the 10x-of-sf0.1 scaling datasets used by bench_scaling_r08_sf1.json.

Driver-side dev tooling only (duckdb) — NOT part of the Scala library.
Two variants, both written as 10-file parquet directories per table so
Spark gets natural read parallelism:

  sf1-clone  (default off): 10 key-shifted replicas, text byte-identical
             — a duplication stress test; pair-emitting queries become
             output-bound (true pairs grow quadratically by construction).
  sf1-unique (default): replicas are content-unique — every word carries
             a replica suffix, embeddings are coordinate-rotated per
             replica, document ids stay contiguous (q103's media
             generator contract) — the clean scaling slope.

Usage: python3 tools/make_sf1.py /root/testdata/sf0.1 /tmp/sf1u [--clone]
Then:  SPARK_GRAFT_SF_DIR=/tmp/sf1u SPARK_GRAFT_BENCH_RUNS=1 ... graft.Bench
"""
import duckdb, os, sys

def main():
    src, dst = sys.argv[1], sys.argv[2]
    clone = "--clone" in sys.argv
    S = 100_000_000  # key stride for the relational tables
    con = duckdb.connect()

    def write(table, k, select):
        d = f"{dst}/{table}.parquet"
        os.makedirs(d, exist_ok=True)
        con.execute(
            f"COPY (SELECT {select} FROM read_parquet('{src}/{table}.parquet'))"
            f" TO '{d}/part-{k:02d}.parquet' (FORMAT PARQUET)")

    for k in range(10):
        if clone:
            write("documents", k,
                  f"doc_id + {k}*{S} AS doc_id, text, lang, source, n_chars")
            write("embeddings", k, f"vec_id + {k}*{S} AS vec_id, embedding, label")
        else:
            suf = chr(97 + k)
            text = ("text" if k == 0 else
                    f"regexp_replace(text, '(\\S+)', '\\1{suf}', 'g')")
            write("documents", k,
                  f"doc_id + {k}*5000 AS doc_id, {text} AS text, "
                  "lang, source, n_chars")
            emb = ("embedding" if k == 0 else
                   f"list_concat(embedding[{k + 1}:], embedding[1:{k}])")
            write("embeddings", k,
                  f"vec_id + {k}*2000 AS vec_id, "
                  f"CAST({emb} AS FLOAT[]) AS embedding, label")
        write("events", k,
              f"event_id + {k}*{S} AS event_id, ts, "
              f"user_id + {k}*{S} AS user_id, event_type, value, props")
        write("customer", k,
              f"c_custkey + {k}*{S} AS c_custkey, c_name, c_nationkey, "
              "c_acctbal, c_mktsegment")
        write("orders", k,
              f"o_orderkey + {k}*{S} AS o_orderkey, "
              f"o_custkey + {k}*{S} AS o_custkey, o_orderstatus, "
              "o_totalprice, o_orderdate, o_orderpriority")
        write("lineitem", k,
              f"l_orderkey + {k}*{S} AS l_orderkey, "
              f"l_partkey + {k}*{S} AS l_partkey, "
              f"l_suppkey + {k}*{S} AS l_suppkey, l_linenumber, l_quantity, "
              "l_extendedprice, l_discount, l_tax, l_returnflag, "
              "l_linestatus, l_shipdate")
        write("part", k,
              f"p_partkey + {k}*{S} AS p_partkey, p_name, p_brand, p_type, "
              "p_size, p_retailprice")
        write("supplier", k,
              f"s_suppkey + {k}*{S} AS s_suppkey, s_name, s_nationkey, "
              "s_acctbal")
    for t in ("region", "nation"):  # dimensions stay as-is
        write(t, 0, "*")
    print(f"wrote {'clone' if clone else 'unique'} 10x dataset to {dst}")

if __name__ == "__main__":
    main()
