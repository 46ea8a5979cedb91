#!/usr/bin/env python
"""Plot training history curves — CLI parity with
/root/reference/plotLosses.py: `python plotLosses.py history1.json
[-d] [-o out.png] [-c config.cfg]`, extended to overlay several folds:
`python plotLosses.py history1.json history2.json ...` draws every fold's
curves on the same axes (per-fold line style, shared legend)."""
import argparse
import json
import math
import os


def format_timespan(seconds: float) -> str:
    seconds = int(seconds)
    parts = []
    for unit, width in (("hour", 3600), ("minute", 60), ("second", 1)):
        value, seconds = divmod(seconds, width)
        if value:
            parts.append(f"{value} {unit}{'s' if value != 1 else ''}")
    return ", ".join(parts) if parts else "0 seconds"


def main():
    parser = argparse.ArgumentParser(
        description="Plot training history",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("JSONFile", nargs="+",
                        help="JSON training history file(s); several files "
                             "overlay as one curve set per fold")
    parser.add_argument("-d", "--display", help="Display plot on screen",
                        action="store_true")
    parser.add_argument("-o", "--output", help="output file")
    parser.add_argument("-c", "--config", help="model and training config file")
    args = parser.parse_args()

    import matplotlib
    if not args.display:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    folds = []
    for path in args.JSONFile:
        with open(path, "r") as fp:
            folds.append((os.path.basename(path), json.load(fp)))
    data = folds[0][1]
    splits = ["training", "validation"]
    metrics = list(data[0]["validation"].keys())

    ncols = 3
    nrows = max(1, -(-len(metrics) // ncols))
    figure, axes = plt.subplots(nrows, ncols, figsize=(18, 10), squeeze=False)
    figure.suptitle(", ".join(name for name, _ in folds), fontsize=16)

    styles = ["-", "--", ":", "-."]
    last_epoch = max(fold[-1]["epoch"] for _, fold in folds)
    for ax, metric in zip(axes.ravel(), metrics):
        label = metric.replace("_", " ")
        ax.set_xlabel("epoch")
        ax.set_ylabel(label)
        ax.set_xlim(0, last_epoch)
        for f, (name, fold) in enumerate(folds):
            epochs = [e["epoch"] for e in fold]
            for split in splits:
                if metric in fold[0][split]:
                    curve_label = (split if len(folds) == 1
                                   else f"{split} [{name}]")
                    ax.plot(epochs, [e[split][metric] for e in fold],
                            styles[f % len(styles)], label=curve_label)
        ax.legend(title=label, loc="center right", fontsize="small")
    for ax in axes.ravel()[len(metrics):]:
        ax.set_visible(False)

    duration = sum(fold[-1]["begin"] - fold[0]["begin"] + fold[-1]["duration"]
                   for _, fold in folds)
    text = "Total training time : " + format_timespan(math.ceil(duration))
    if args.config:
        from meshvae_tpu.config import read_config
        text += "\nConfig : " + json.dumps(
            {k: v for k, v in read_config(args.config).items()
             if not isinstance(v, (list, dict))})
    figure.text(0.1, 0.15, text, wrap=True)

    if args.display:
        plt.show()
    if args.output:
        plt.savefig(args.output)


if __name__ == "__main__":
    main()
