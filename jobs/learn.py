"""spark-submit job: the reference's `netml learn` flow (cli.py:371-583)
re-expressed on the engine — extract features from one or more event
tables, label them, train an anomaly detector, report AUC.

    spark-submit --py-files dist/netml_spark.zip jobs/learn.py \
        --inputs <events parquet> [<events parquet> ...] \
        --labels <labels parquet with (doc_id, label_raw[, src_order])> \
        --feat-type IAT --model pca --output-model /tmp/model.json

Differences from the reference, by design (SURVEY.md §2.12): models are
numpy-only (no sklearn/torch here) — PCA reconstruction error, spherical
GMM, isolation forest, gaussian KDE, RBF one-class SVM, or an MLP
autoencoder; train/test split is a deterministic hash split (no sklearn
train_test_split), test fraction 0.33 as in cli.py:511-519.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="+", required=True)
    ap.add_argument("--labels", default=None)
    ap.add_argument("--feat-type", default="IAT")
    ap.add_argument("--q-interval", type=float, default=0.9)
    ap.add_argument("--model",
                    choices=["pca", "gmm", "iforest", "kde", "ocsvm", "ae"],
                    default="pca")
    ap.add_argument("--n-components", type=int, default=2)
    ap.add_argument("--contamination", type=float, default=0.1)
    ap.add_argument("--test-frac", type=float, default=0.33)
    ap.add_argument("--entity-cols", default="doc_id")
    ap.add_argument("--ts-col", default="ts")
    ap.add_argument("--token-col", default="token")
    ap.add_argument("--order-cols", default="seq")
    # required, as in the reference: `netml learn` refuses to train into
    # the void (tests/cli_tests/test_learn.py:63-77 — exit 2, "arguments
    # are required .+: -o/--output/-m/--model")
    ap.add_argument("-m", "--output-model", required=True)
    args = ap.parse_args(argv)

    import numpy as np
    from pyspark.sql import functions as F

    from netml_spark import ndm
    from netml_spark.operators.labels import label_join
    from netml_spark.pipeline import FeaturePlan
    from netml_spark.session import get_spark

    spark = get_spark("netml-learn")
    entity_cols = tuple(args.entity_cols.split(","))
    order_cols = tuple(c for c in args.order_cols.split(",") if c)

    # extract per input, union (cli.py:475-480 multi-pcap concat twin)
    feats = None
    for path in args.inputs:
        ev = spark.read.parquet(path)
        plan = FeaturePlan(feat_type=args.feat_type, q_interval=args.q_interval)
        carry = ("source",) if "source" in ev.columns else ()
        f = plan.extract(ev, entity_cols, args.ts_col, args.token_col,
                         order_cols, carry_cols=carry)
        feats = f if feats is None else feats.unionByName(f)

    label_col = None
    if args.labels:
        labels = spark.read.parquet(args.labels)
        order_col = "src_order" if "src_order" in labels.columns else None
        feats = label_join(feats, labels, (entity_cols[0],), order_col=order_col)
        label_col = "label"

    X, y = ndm.collect_matrix(feats, "features", label_col)
    print(f"feature matrix: {X.shape}, labels: "
          f"{None if y is None else dict(zip(*np.unique(y, return_counts=True)))}")

    # deterministic hash split (reference: train_test_split 0.33)
    h = (np.arange(len(X)) * 2654435761 % 2**32) / 2**32
    test = h < args.test_frac
    if args.model in ("pca", "gmm"):
        det = ndm.DETECTORS[args.model](args.n_components)
    else:
        det = ndm.DETECTORS[args.model]()
    model = ndm.Model(det, contamination=args.contamination)
    model.train(X[~test])
    report = {"model": args.model, "n_train": int((~test).sum()),
              "n_test": int(test.sum()), "feat_type": args.feat_type}
    if y is not None and len(set(y[test])) == 2:
        report["auc"] = round(model.test(X[test], y[test]), 4)
    report["extract"] = {
        "feat_type": args.feat_type, "q_interval": args.q_interval,
        "entity_cols": args.entity_cols, "ts_col": args.ts_col,
        "token_col": args.token_col, "order_cols": args.order_cols,
    }
    model.history["report"] = report
    print(json.dumps(report))
    if args.output_model:
        model.save(args.output_model)
        print(f"wrote {args.output_model}")


if __name__ == "__main__":
    main()
