"""Command-line entry points: extract / train / evaluate / validate-data.

The reference ships no CLI (its driver is absent, SURVEY.md layer T); these
commands are the framework's user surface:

  python -m wealy_tpu.cli extract   --config conf.json --split train
  python -m wealy_tpu.cli train     --config conf.json
  python -m wealy_tpu.cli evaluate  --config conf.json --split test
  python -m wealy_tpu.cli validate-data --config conf.json
"""
