# -*- coding: utf-8 -*-
"""Result writing and visualization.

Output parity with the reference's ``save_results`` (remo3d.py:902-1147): logs that
share a depth axis are grouped into ``Results_N.txt`` TSVs (names row + units row,
``%.4f``) inside a timestamped ``Results_YYYY_MM_DD__HH_MM_SS/`` folder, plus a
``Results_plot.png`` showing the dip-sheared formation cross-section colored by
resistivity (viridis), the borehole polygon, and multi-track log curves with per-log
twiny axes and NaN break/continue handling.
"""

from __future__ import annotations

import datetime
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import scipy.interpolate as spi
from matplotlib import ticker
from matplotlib.collections import PatchCollection
from matplotlib.lines import Line2D
from matplotlib.patches import Polygon


def save_results_impl(
    logs,
    formation_parameters,
    borehole_parameters,
    dip,
    output_folder=None,
    measurements_to_save="auto",
    plot_layout="auto",
    plot_depth_lim="auto",
    plot_aspect_ratio="auto",
    model_rad_lim="auto",
    model_res_lim="auto",
    logs_res_lim="auto",
    logs_at_nan="break",
    logs_interpolation_factor=1,
    logs_colours="auto",
):
    if logs is None:
        raise ValueError("No logs to save - run simulate_logs first")
    logs = {k: np.asarray(v) for k, v in logs.items()}
    output_subfolder = None

    # ---- TSV output ---------------------------------------------------------------
    if output_folder is not None:
        output_subfolder = os.path.join(
            output_folder,
            "Results_{}/".format(datetime.datetime.now().strftime("%Y_%m_%d__%H_%M_%S")),
        )
        os.makedirs(output_subfolder, exist_ok=True)

        if measurements_to_save == "auto":
            measurements_to_save = list(logs.keys())

        logs_to_save = list(measurements_to_save)
        file_number = 1
        while logs_to_save:
            group = [logs_to_save[0]]
            for name in logs_to_save[1:]:
                if logs[group[0]][:, 0].shape == logs[name][:, 0].shape and np.all(
                    np.isclose(logs[group[0]][:, 0], logs[name][:, 0])
                ):
                    group.append(name)
            for name in group:
                logs_to_save.remove(name)

            data = logs[group[0]]
            for name in group[1:]:
                data = np.hstack([data, np.atleast_2d(logs[name][:, 1]).T])
            names = ["DEPTH"] + group
            units = ["M"] + ["OHMM"] * len(group)
            header = "\t".join(names) + "\n" + "\t".join(units)
            np.savetxt(
                os.path.join(output_subfolder, f"Results_{file_number}.txt"),
                data,
                fmt="%.4f",
                delimiter="\t",
                header=header,
                comments="",
            )
            file_number += 1

    # ---- Visualization ------------------------------------------------------------
    if logs_interpolation_factor > 1:
        for name in list(logs.keys()):
            depths = logs[name][:, 0]
            interp_depths = np.linspace(
                np.min(depths), np.max(depths), int(depths.size * logs_interpolation_factor)
            )
            f = spi.interp1d(depths, logs[name][:, 1], kind="cubic")
            logs[name] = np.vstack([interp_depths, f(interp_depths)]).T

    formation_parameters = np.array(formation_parameters, dtype=float, copy=True)
    if plot_depth_lim == "auto":
        plot_depth_lim = [
            np.nanmin(formation_parameters[:, :2]),
            np.nanmax(formation_parameters[:, :2]),
        ]
    if model_rad_lim == "auto":
        if np.all(np.isnan(formation_parameters[:, 2])):
            model_rad_lim = [
                -10 * np.nanmax(borehole_parameters[:, 1]),
                10 * np.nanmax(borehole_parameters[:, 1]),
            ]
        else:
            model_rad_lim = [
                -2 * np.nanmax(formation_parameters[:, 2]),
                2 * np.nanmax(formation_parameters[:, 2]),
            ]
    if logs_res_lim == "auto":
        res_max = max(np.nanmax(log[:, 1]) for log in logs.values())
        res_min = min(np.nanmin(log[:, 1]) for log in logs.values())
        scale = 10 ** np.floor(np.log10(res_max) - 1)
        logs_res_lim = [np.floor(res_min / scale) * scale, np.ceil(res_max / scale) * scale]
    if plot_aspect_ratio == "auto":
        plot_aspect_ratio = (plot_depth_lim[1] - plot_depth_lim[0]) / 25 * 1.25

    # Formation polygons, sheared by tan(dip) (remo3d.py:1028-1056).
    patches = []
    a = np.tan(np.asarray(dip, dtype=float) * np.pi / 180)
    formation_parameters[0, 0] -= a * model_rad_lim[1]
    formation_parameters[-1, 1] += a * model_rad_lim[1]
    for i in range(formation_parameters.shape[0]):
        top, bottom, fz_r = formation_parameters[i, :3]
        outer = np.array(
            [
                [model_rad_lim[0], top + a * model_rad_lim[0]],
                [model_rad_lim[0], bottom + a * model_rad_lim[0]],
                [model_rad_lim[1], bottom + a * model_rad_lim[1]],
                [model_rad_lim[1], top + a * model_rad_lim[1]],
            ]
        )
        patches.append(Polygon(outer, closed=True))
        if not np.isnan(fz_r):
            inner = np.array(
                [
                    [-fz_r, top + a * -fz_r],
                    [-fz_r, bottom + a * -fz_r],
                    [fz_r, bottom + a * fz_r],
                    [fz_r, top + a * fz_r],
                ]
            )
            patches.append(Polygon(inner, closed=True))
    resistivities = np.ndarray.flatten(np.flip(formation_parameters[:, 3:], axis=1))

    if borehole_parameters is not None:
        left = borehole_parameters[:, [1, 0]] * [-1, 1]
        right = borehole_parameters[:, [1, 0]]
        patches.append(Polygon(np.vstack([left, np.flip(right, axis=0)]), closed=True))
        resistivities = np.hstack([resistivities, np.mean(borehole_parameters[:, 2])])
    borehole_axis = Line2D([0, 0], plot_depth_lim, color="black")

    tracks = 1 if plot_layout == "auto" else len(plot_layout)
    fig_width = 5 + 5 * tracks
    fig_height = fig_width * plot_aspect_ratio

    resistivities = resistivities[~np.isnan(resistivities)]
    collection = PatchCollection(patches, cmap=matplotlib.cm.viridis)
    collection.set_array(resistivities)
    if model_res_lim != "auto":
        collection.set_clim(model_res_lim)

    fig, ax = plt.subplots(
        1, 1 + tracks, sharey=True, figsize=[fig_width, fig_height], facecolor="white"
    )
    ax = np.atleast_1d(ax)

    ax[0].add_collection(collection)
    ax[0].add_line(borehole_axis)
    ax[0].margins(x=0, y=0)
    ax[0].set_xlim(model_rad_lim)
    ax[0].set_ylim(plot_depth_lim)
    ax[0].invert_yaxis()
    ax[0].minorticks_on()
    ax[0].set_title("Formation model\n" + "dip = " + str(dip) + "\N{DEGREE SIGN}\n")
    ax[0].set_xlabel("Radial distance [m]", labelpad=10)
    ax[0].set_ylabel("Depth [m]", labelpad=10)
    ticks = ax[0].get_xticks()
    ax[0].xaxis.set_major_locator(ticker.FixedLocator(ticks))
    ax[0].set_xticklabels(["{0:.2f}".format(abs(t)) for t in ticks])
    ax[0].xaxis.set_ticks_position("top")
    ax[0].xaxis.set_label_position("top")
    ax[0].autoscale_view()

    for track in range(1, tracks + 1):
        if logs_colours == "auto":
            track_colours = plt.rcParams["axes.prop_cycle"].by_key()["color"]
        else:
            track_colours = logs_colours[track - 1]
        track_logs = list(logs.keys()) if plot_layout == "auto" else plot_layout[track - 1]
        axis = ax[track]
        for i, name in enumerate(track_logs):
            axis = ax[track] if i == 0 else ax[track].twiny()
            colour = track_colours[i % len(track_colours)]
            if logs_at_nan == "break":
                axis.plot(logs[name][:, 1], logs[name][:, 0], color=colour)
            elif logs_at_nan == "continue":
                ok = ~np.isnan(logs[name][:, 1])
                axis.plot(logs[name][ok, 1], logs[name][ok, 0], color=colour)
            else:
                raise ValueError('logs_at_nan paramater has to be set to "break" or "continue"')
            axis.set_xlabel(name + "\n[ohmm]", color=colour, labelpad=-8)
            axis.spines["top"].set_color(colour)
            axis.spines["top"].set_position(("outward", i * 55 + 10))
            axis.set_xticks(logs_res_lim)
            axis.tick_params(axis="x", color=colour)
            axis.set_xlim(logs_res_lim)
        ax[track].twiny().get_xaxis().set_visible(False)
    for track in range(1, tracks + 1):
        ax[track].grid(True)
        ax[track].xaxis.set_label_position("top")
        ax[track].xaxis.set_ticks_position("top")
        ax[track].margins(x=0, y=0)
        ax[track].autoscale_view()

    fig.colorbar(
        collection,
        ax=ax,
        location="bottom",
        orientation="horizontal",
        pad=0.05,
        label="Resistivity [ohmm]",
        shrink=min([1, plot_aspect_ratio]),
    )

    if output_subfolder is not None:
        plt.savefig(os.path.join(output_subfolder, "Results_plot.png"), bbox_inches="tight")
    plt.close(fig)
    return output_subfolder
