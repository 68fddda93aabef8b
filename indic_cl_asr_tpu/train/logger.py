"""Run logger: wandb (when available) + text log + JSONL metrics.

Reference: utils.py:7-53 `Logger` — every `log(dict)` goes to wandb and is
appended to ``output_dir/<run_id>/log.txt``; numeric values are accumulated
and re-logged as ``epoch_avg_*`` on `log_epoch_average()`. We keep that
contract, add a machine-readable metrics.jsonl, and degrade gracefully when
wandb is not installed or offline (this environment has no egress).
"""

from __future__ import annotations

import json
import os
import time
import uuid


class Logger:
    def __init__(
        self,
        output_dir: str,
        run_id: str | None = None,
        use_wandb: bool = True,
        wandb_kwargs: dict | None = None,
    ):
        # Multihost contract (run on every process, like the driver):
        # one SHARED run dir — process 0 draws the run id and broadcasts
        # it so per-task checkpoints land where every process can restore
        # them (orbax writes from the primary host only) — with the
        # canonical log/metrics stream owned by process 0 and other ranks
        # writing rank-suffixed streams (same dir, no interleaving).
        import jax

        self.rank = jax.process_index()
        if run_id is None:
            run_id = uuid.uuid4().hex[:8]
            if jax.process_count() > 1:
                import numpy as np

                from ..parallel.distributed import broadcast_from_main

                arr = broadcast_from_main(
                    np.frombuffer(run_id.encode(), dtype=np.uint8)
                )
                run_id = arr.tobytes().decode()
        self.run_id = run_id
        self.dir = os.path.join(output_dir, self.run_id)
        os.makedirs(self.dir, exist_ok=True)
        sfx = "" if self.rank == 0 else f".rank{self.rank}"
        self._txt = open(os.path.join(self.dir, f"log{sfx}.txt"), "a")
        self._jsonl = open(
            os.path.join(self.dir, f"metrics{sfx}.jsonl"), "a"
        )
        self._epoch_acc: dict[str, list[float]] = {}
        self._wandb = None
        if use_wandb and self.rank == 0:
            try:
                import wandb

                self._wandb = wandb.init(
                    dir=self.dir, **(wandb_kwargs or {})
                )
            except Exception:
                self._wandb = None  # no wandb / no egress: text-only

    def log(self, record: dict) -> None:
        stamped = {"_time": time.time(), **_to_plain(record)}
        self._txt.write(json.dumps(stamped, ensure_ascii=False) + "\n")
        self._txt.flush()
        self._jsonl.write(json.dumps(stamped, ensure_ascii=False) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(record)
        for k, v in record.items():
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                self._epoch_acc.setdefault(k, []).append(float(v))

    def log_epoch_average(self) -> dict:
        """Re-log accumulated numeric means as epoch_avg_* and reset
        (utils.py:34-53)."""
        avg = {
            f"epoch_avg_{k}": sum(v) / len(v)
            for k, v in self._epoch_acc.items()
            if v
        }
        self._epoch_acc.clear()
        if avg:
            self.log(avg)
        return avg

    def log_bwt_curves(
        self, curves: dict[str, list[tuple[int, float]]]
    ) -> None:
        """Per-language BWT scatter + line plots (reference
        utils.py:213-240 `log_bwt_curves_wandb`). With live wandb this
        uploads wandb.plot.scatter / line_series per language; the curves
        are always also written to <dir>/bwt_curves.json so the offline
        analysis pipeline (analysis/results.py) can render them."""
        if self.rank != 0:
            return
        plain = {
            lang: [[int(t), float(b)] for t, b in pts]
            for lang, pts in curves.items()
        }
        with open(os.path.join(self.dir, "bwt_curves.json"), "w") as f:
            json.dump(plain, f, indent=2)
        if self._wandb is None:
            return
        import wandb

        for lang, points in curves.items():
            if not points:
                continue
            table = wandb.Table(
                columns=["Task Index", "BWT"],
                data=[[t, b] for t, b in points],
            )
            self._wandb.log({
                f"BWT/{lang}/scatter": wandb.plot.scatter(
                    table, "Task Index", "BWT",
                    title=f"BWT vs Task Index ({lang})",
                ),
                f"BWT/{lang}/line": wandb.plot.line_series(
                    xs=[t for t, _ in points],
                    ys=[[b for _, b in points]],
                    keys=[lang],
                    title=f"BWT curve ({lang})",
                    xname="Task Index",
                ),
            })

    def close(self) -> None:
        self._txt.close()
        self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()


def _to_plain(record: dict) -> dict:
    out = {}
    for k, v in record.items():
        try:
            out[k] = float(v) if hasattr(v, "item") else v
        except Exception:
            out[k] = str(v)
    return out
