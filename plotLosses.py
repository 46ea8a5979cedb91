#!/usr/bin/env python
"""Plot training history curves — CLI parity with
/root/reference/plotLosses.py: `python plotLosses.py history1.json
[-d] [-o out.png] [-c config.cfg]`."""
import argparse
import json
import math


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
    parser.add_argument("JSONFile", help="JSON training history file")
    parser.add_argument("-d", "--display", help="Display plot on screen",
                        action="store_true")
    parser.add_argument("-o", "--output", help="output file")
    parser.add_argument("-c", "--config", help="model and training config file")
    args = parser.parse_args()

    import matplotlib
    if not args.display:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(args.JSONFile, "r") as fp:
        data = json.load(fp)
    splits = ["training", "validation"]
    metrics = list(data[0]["validation"].keys())
    epochs = [e["epoch"] for e in data]

    ncols = 3
    nrows = max(1, -(-len(metrics) // ncols))
    figure, axes = plt.subplots(nrows, ncols, figsize=(18, 10), squeeze=False)
    figure.suptitle(args.JSONFile, fontsize=16)

    for ax, metric in zip(axes.ravel(), metrics):
        label = metric.replace("_", " ")
        ax.set_xlabel("epoch")
        ax.set_ylabel(label)
        ax.set_xlim(0, epochs[-1])
        for split in splits:
            if metric in data[0][split]:
                ax.plot(epochs, [e[split][metric] for e in data], label=split)
        ax.legend(title=label, loc="center right")
    for ax in axes.ravel()[len(metrics):]:
        ax.set_visible(False)

    duration = (data[-1]["begin"] - data[0]["begin"] + data[-1]["duration"])
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
