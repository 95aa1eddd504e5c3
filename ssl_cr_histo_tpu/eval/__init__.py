"""Evaluation: metrics (ICC, F1, AUC, ...), reporting artifacts, and
WSI heatmap inference."""
