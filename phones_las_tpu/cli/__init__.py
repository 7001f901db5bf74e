"""Command-line entry points (reference: ``train.py`` / ``infer.py`` +
prep scripts at the repo root; SURVEY.md §2 L5/L1).

Usage:
  python -m phones_las_tpu.cli.prepare timit --root ... --out data/timit
  python -m phones_las_tpu.cli.train --preset timit_phone_las --data data/timit --workdir runs/t1
  python -m phones_las_tpu.cli.infer --workdir runs/t1 --data data/timit/test.plu
"""
