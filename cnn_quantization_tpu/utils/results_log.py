"""ResultsLog: row-oriented experiment results with CSV/JSON persistence and
optional plots.

Reference: utils/log.py:67-229 (pandas + bokeh HTML).  Plots here use
matplotlib (PNG) when available; data persistence is the load-bearing part.
"""

from __future__ import annotations

import os

import pandas as pd


class ResultsLog:
    def __init__(self, path: str, title: str = ''):
        self.path = path
        self.title = title
        self.df = pd.DataFrame()
        self.figures = []

    def add(self, **kwargs):
        self.df = pd.concat([self.df, pd.DataFrame([kwargs])], ignore_index=True)

    def save(self):
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        self.df.to_csv(self.path + '.csv', index=False)
        self.df.to_json(self.path + '.json', orient='records')

    def load(self):
        if os.path.exists(self.path + '.csv'):
            self.df = pd.read_csv(self.path + '.csv')
        return self

    def plot(self, x: str, y, title: str | None = None):
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            ys = [y] if isinstance(y, str) else list(y)
            fig, ax = plt.subplots()
            for col in ys:
                ax.plot(self.df[x], self.df[col], marker='o', label=col)
            ax.set_xlabel(x)
            ax.legend()
            ax.set_title(title or self.title)
            fig.savefig(self.path + f'_{x}.png', dpi=110)
            plt.close(fig)
        except Exception:
            pass

    def __str__(self):
        return self.df.to_string()
