#!/usr/bin/env python
"""Analyse inference results — CLI parity with /root/reference/report.py:
`python report.py inference.json [-p] [-e]`."""
import argparse
import json


def main():
    parser = argparse.ArgumentParser(
        description="Analyse inference results",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("JSONFile", help="JSON inference results file")
    parser.add_argument("-p", help="Analyse sex prediction results",
                        action="store_true")
    parser.add_argument("-e", help="List max reconstruction errors",
                        action="store_true")
    args = parser.parse_args()

    with open(args.JSONFile, "r") as fp:
        data = json.load(fp)

    individuals = []
    n_predictions = 0
    n_wrong = 0

    for name in data:
        data[name]["file"] = name
        individuals.append(data[name])
        n_predictions += 1

        if args.p:
            sex_token = name.split("_")[1]
            sex = 0 if sex_token == "f" else 1
            if sex != data[name]["sex"]:
                n_wrong += 1
                print(name + ": wrong prediction")
                err = data[name]["reconstruction_error"]
                print("reconstruction error : max= " + str(err["max"]) +
                      ", mean= " + str(err["mean"]))

    print(str(n_predictions) + " predictions")
    if args.p:
        accuracy = 100 - (100 * n_wrong / n_predictions) if n_predictions else 0
        print("{} wrong predictions. Accuracy : {:.2f}%)".format(n_wrong,
                                                                 accuracy))
    if args.e:
        print("Sorted max errors:")
        individuals.sort(key=lambda i: i["reconstruction_error"]["max"])
        for ind in individuals:
            print(ind["file"] + " : " + str(ind["reconstruction_error"]["max"]))


if __name__ == "__main__":
    main()
