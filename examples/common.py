"""Shared reporting helpers for the example pipelines (mirrors the print
sections of the reference examples, ExampleReport.java:110-157)."""

from __future__ import annotations

import numpy as np


def print_listener(name, old, new):
    print(f"Info: {name} {old} --> {new}")


def print_results(adjustment, cameras, datum_char=lambda oc: "d" if oc.datum else "o"):
    D = adjustment.get_cofactor_matrix()
    s2 = adjustment.get_variance_factor_aposteriori()

    for oc in adjustment.get_object_coordinates():
        ux = uy = uz = 0.0
        if D is not None and all(p.column >= 0 for p in oc.params):
            ux = np.sqrt(abs(s2 * D[oc.x.column, oc.x.column]))
            uy = np.sqrt(abs(s2 * D[oc.y.column, oc.y.column]))
            uz = np.sqrt(abs(s2 * D[oc.z.column, oc.z.column]))
        print(f"{oc.name:>10}\t{oc.x.value:+16.5f}\t{oc.y.value:+16.5f}\t"
              f"{oc.z.value:+16.5f}\t{ux:+12.5f}\t{uy:+12.5f}\t{uz:+12.5f}\t"
              f"{datum_char(oc)}")
    print()

    for camera in cameras:
        names = ("PRINCIPAL_POINT_X", "PRINCIPAL_POINT_Y", "PRINCIPAL_DISTANCE")
        for name, p in zip(names, camera.io.params):
            print(f"{name:<27} = {p.value:+15.10f} {'fixed' if p.fixed else ''}")
        for kind in sorted(camera.distortion_models.keys()):
            for key, p in camera.distortion_models[kind].coefficients:
                label = f"{kind.name}({key})" if key > 0 else kind.name
                print(f"{label:<27} = {p.value:+15.10f} "
                      f"{'fixed' if p.fixed else ''}")
        print()

    s2_prio = adjustment.get_variance_factor_apriori()
    print("Number of observations:          ", adjustment.get_number_of_observations())
    print("Number of unknown parameters:    ", adjustment.get_number_of_unknown_parameters())
    print("Degree of freedom:               ", adjustment.get_degree_of_freedom())
    print("Variances of unit weight:         1.0 :", s2 / s2_prio)
    print("Variances of unit weight (ratio):", s2_prio, ":", s2)
