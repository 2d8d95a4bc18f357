"""CSV experiment logs for sweeps.

Reference: utils/log.py:241-266 (``EvalLog``) — a tiny DataFrame-backed
append+save log used by the precision and layer-sensitivity sweeps.
"""

from __future__ import annotations

import os

import pandas as pd


class EvalLog:
    def __init__(self, columns, path: str | None = None, auto_save: bool = False):
        self.df = pd.DataFrame(columns=list(columns))
        self.path = path
        self.auto_save = auto_save

    def log(self, *values):
        self.df.loc[len(self.df)] = list(values)
        if self.auto_save and self.path:
            self.save(self.path)

    def save(self, path: str | None = None):
        path = path or self.path
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self.df.to_csv(path, index=False)

    def __str__(self):
        return self.df.to_string()
