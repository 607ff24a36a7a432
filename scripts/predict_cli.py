"""Single-text serving CLI — the reference predict.py analog (§3.2):
one JSON line of triples per input line, no Spark session needed (the
cascade is row-local; reference RelationExtractionModel.predict).

Usage:
  echo "the anchor model is used for quartz sampler ." | \
      python scripts/predict_cli.py [--model repos]
  python scripts/predict_cli.py --text "..." [--model repos]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="repos")
    ap.add_argument("--text", default=None, help="single input (else stdin lines)")
    args = ap.parse_args()

    from kgforge.eval import predict_text

    lines = [args.text] if args.text is not None else sys.stdin
    for line in lines:
        line = line.rstrip("\n")
        if not line.strip():
            continue
        print(json.dumps({"text": line, "triples": predict_text(line, args.model)}))


if __name__ == "__main__":
    main()
