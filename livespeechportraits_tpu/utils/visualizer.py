"""Training observability: scalar logging, image dumps, HTML galleries.

Capability parity with util/visualizer.py (TensorBoard scalars + loss-log
text file + per-epoch HTML image galleries + save_images) and util/html.py
(dominate-based report) - rebuilt without the dominate dependency and with
TensorBoard writing gated on torch.utils.tensorboard availability (falls
back to a CSV scalar log).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Iterable, List, Mapping, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def tensor2im(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float image (HWC or CHW) -> uint8 HWC (util/util.py:19-42)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = img.transpose(1, 2, 0)
    out = ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    if out.ndim == 2:
        out = out[..., None]
    if out.shape[-1] == 1:
        out = np.repeat(out, 3, axis=-1)
    return out


class HTMLReport:
    """Minimal image-table web page (util/html.py:6-67 parity)."""

    def __init__(self, web_dir: str, title: str, refresh: int = 0):
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        self.title = title
        self.refresh = refresh
        os.makedirs(self.img_dir, exist_ok=True)
        self._body: List[str] = []

    def get_image_dir(self) -> str:
        return self.img_dir

    def add_header(self, text: str) -> None:
        self._body.append(f"<h3>{text}</h3>")

    def add_images(self, ims: Iterable[str], txts: Iterable[str],
                   links: Iterable[str], width: int = 400) -> None:
        cells = []
        for im, txt, link in zip(ims, txts, links):
            cells.append(
                f'<td style="word-wrap:break-word" halign="center" valign="top">'
                f'<p><a href="images/{link}"><img src="images/{im}" '
                f'style="width:{width}px"></a><br>{txt}</p></td>'
            )
        self._body.append(
            '<table border="1" style="table-layout:fixed"><tr>' + "".join(cells) + "</tr></table>"
        )

    def save(self) -> str:
        refresh = (f'<meta http-equiv="refresh" content="{self.refresh}">'
                   if self.refresh > 0 else "")
        html = (f"<!DOCTYPE html><html><head><title>{self.title}</title>{refresh}</head>"
                f"<body>{''.join(self._body)}</body></html>")
        path = os.path.join(self.web_dir, "index.html")
        with open(path, "w") as f:
            f.write(html)
        return path


class Visualizer:
    """Scalar + image logging for training loops (util/visualizer.py:14-149).

    - plot_current_errors: TensorBoard scalars when torch.utils.tensorboard
      is importable, always mirrored to scalars.csv
    - print_current_errors: console + append-only loss_log.txt
    - display_current_results: dump images + per-epoch HTML gallery
    - save_images: numbered jpg dumps (the demo's frame writer)
    """

    def __init__(self, checkpoints_dir: str, name: str, use_html: bool = True):
        self.name = name
        self.save_dir = os.path.join(checkpoints_dir, name)
        self.web_dir = os.path.join(self.save_dir, "web")
        self.img_dir = os.path.join(self.web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.use_html = use_html
        self.log_path = os.path.join(self.save_dir, "loss_log.txt")
        self.csv_path = os.path.join(self.save_dir, "scalars.csv")
        with open(self.log_path, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) ================\n")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=os.path.join(self.save_dir, "tb"))
        except Exception:
            self._tb = None
        self._epoch_images: Dict[int, List[str]] = {}
        self._csv_keys: Optional[List[str]] = None

    # -- scalars ----------------------------------------------------------

    def plot_current_errors(self, errors: Mapping[str, float], step: int) -> None:
        if self._tb is not None:
            for k, v in errors.items():
                self._tb.add_scalar(k, float(v), step)
        # A fresh header precedes every KEY-SET change (train metrics and
        # periodic validation metrics interleave in the same file, and a
        # resumed run may log different keys): rows always align with the
        # nearest header above them instead of being silently misread
        # under the first call's columns.
        keys = list(errors.keys())
        with open(self.csv_path, "a", newline="") as f:
            w = csv.writer(f)
            if keys != self._csv_keys:
                w.writerow(["step"] + keys)
                self._csv_keys = keys
            w.writerow([step] + [float(v) for v in errors.values()])

    def print_current_errors(self, epoch: int, iters: int,
                             errors: Mapping[str, float], t: float = 0.0) -> str:
        message = f"(epoch: {epoch}, iters: {iters}, time: {t:.3f}) "
        message += " ".join(f"{k}: {float(v):.3f}" for k, v in errors.items())
        print(message)
        with open(self.log_path, "a") as f:
            f.write(message + "\n")
        return message

    vis_print = staticmethod(print)

    # -- images -----------------------------------------------------------

    def display_current_results(self, visuals: Mapping[str, np.ndarray],
                                epoch: int, step: int = 0) -> None:
        names = []
        for label, img in visuals.items():
            fname = f"epoch{epoch:03d}_{label}.jpg"
            self._write_image(os.path.join(self.img_dir, fname), img)
            names.append(fname)
        self._epoch_images[epoch] = names
        if self.use_html:
            report = HTMLReport(self.web_dir, f"Experiment name = {self.name}")
            for e in sorted(self._epoch_images, reverse=True):
                report.add_header(f"epoch [{e}]")
                ims = self._epoch_images[e]
                report.add_images(ims, [n.split("_", 1)[1] for n in ims], ims)
            report.save()

    def save_images(self, save_root: str, visuals: Mapping[str, np.ndarray],
                    name: str) -> None:
        """demo.py:268-272 parity: <label>_<name>.jpg per visual."""
        os.makedirs(save_root, exist_ok=True)
        for label, img in visuals.items():
            self._write_image(os.path.join(save_root, f"{label}_{name}.jpg"), img)

    @staticmethod
    def _write_image(path: str, img: np.ndarray) -> None:
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = tensor2im(img)
        if img.ndim == 3 and img.shape[-1] == 1:
            img = img[..., 0]  # cvtColor rejects 1-channel "RGB"
        if cv2 is not None:
            cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
                        if img.ndim == 3 else img)
        else:  # pragma: no cover
            from PIL import Image

            Image.fromarray(img).save(path)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
