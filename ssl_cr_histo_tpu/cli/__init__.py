"""Command-line entry points mirroring the reference scripts:

  pretrain.py     <- pretrain_BreastPathQ.py / pretrain_Camelyon16.py /
                     Pretraining_v2/pretrain_RSP.py
  finetune.py     <- eval_{BreastPathQ,Camelyon,Kather}_SSL.py
  consistency.py  <- eval_{BreastPathQ,Camelyon,Kather}_SSL_CR.py
  heatmap.py      <- test_Camelyon16.py

Run as `python -m ssl_cr_histo_tpu.cli.<name> --help`.
"""
