"""t-SNE visualisation: static plot (E10) + interactive Tk GUI (E11).

Static: sklearn TSNE(n_components=2) -> class-coloured scatter -> PNG
(functions/functions_RESNET50_Truncate.py:423-444).
Interactive: Tkinter window with an embedded matplotlib canvas — point pick
shows the source image, right-click enables a PolygonSelector, "Close
Polygon" writes inside/outside_polygon.json and fills a dropdown, z/a zoom
(:447-617). Headless environments (no $DISPLAY) automatically fall back to
the static plot so the artifact surface stays testable.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence

import numpy as np


def _tsne_2d(embeddings: np.ndarray, random_state: int = 0) -> np.ndarray:
    from sklearn.manifold import TSNE

    emb = np.asarray(embeddings).reshape(len(embeddings), -1)
    # sklearn requires perplexity < n_samples
    perplexity = min(30.0, max(1.0, (len(emb) - 1) / 3.0))
    tsne = TSNE(n_components=2, random_state=random_state, perplexity=perplexity)
    return tsne.fit_transform(emb)


def _color_map(labels: np.ndarray, colors: Optional[Sequence[str]], cmap_name="tab20"):
    import matplotlib.pyplot as plt

    unique = np.unique(labels)
    if colors and len(colors) >= len(unique):
        return {int(l): colors[i] for i, l in enumerate(unique)}, unique
    cmap = plt.get_cmap(cmap_name)
    return {int(l): cmap(i / max(len(unique), 1)) for i, l in enumerate(unique)}, unique


def perform_tsne(
    embeddings,
    labels,
    class_names: List[str],
    colors: Optional[Sequence[str]] = None,
    results_dir: str = "results",
    show: bool = False,
    random_state: int = 0,
    filename: str = "tsne_plot.png",
) -> str:
    import matplotlib

    if not os.environ.get("DISPLAY"):
        matplotlib.use("Agg")
        show = False
    import matplotlib.pyplot as plt

    print("Running t-SNE...")
    labels = np.asarray(labels)
    pts = _tsne_2d(embeddings, random_state)
    plt.figure(figsize=(10, 10))
    color_map, unique = _color_map(labels, colors)
    for label in unique:
        idx = labels == label
        plt.scatter(pts[idx, 0], pts[idx, 1], label=class_names[int(label)],
                    color=color_map[int(label)])
    plt.legend()
    os.makedirs(results_dir, exist_ok=True)
    path = os.path.join(results_dir, filename)
    plt.savefig(path)
    if show:
        plt.show()
    plt.close()
    print(f"t-SNE plot saved to '{path}'")
    return path


def analyze_polygon_points(
    tsne_results: np.ndarray,
    polygon: List,
    labels,
    classes: List[str],
    img_paths: List[str],
    save_dir: str,
):
    """Polygon containment analysis + JSON artifacts (:544-561). Pulled out of
    the GUI so it is unit-testable headlessly."""
    from matplotlib.path import Path

    inside, outside = [], []
    poly = Path(polygon)
    for i, (x, y) in enumerate(np.asarray(tsne_results)):
        rec = {
            "path": img_paths[i],
            "class": classes[int(labels[i])],
            "position": [float(x), float(y)],
        }
        (inside if poly.contains_point((x, y)) else outside).append(rec)
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "inside_polygon.json"), "w") as f:
        json.dump(inside, f)
    with open(os.path.join(save_dir, "outside_polygon.json"), "w") as f:
        json.dump(outside, f)
    return inside, outside


def plot_tsne_interactive(
    embeddings,
    labels,
    classes: List[str],
    img_paths: List[str],
    colors: Optional[Sequence[str]] = None,
    num_clusters: Optional[int] = None,
    save_dir: str = "results",
    random_state: int = 42,
):
    """Interactive Tk GUI (needs $DISPLAY; falls back to the static plot
    headlessly, keeping the JSON/PNG artifact surface)."""
    labels = np.asarray(labels)
    if not os.environ.get("DISPLAY"):
        print("No display available — falling back to static t-SNE plot.")
        return perform_tsne(embeddings, labels, classes, colors, save_dir,
                            random_state=random_state)

    import tkinter as tk
    from tkinter import ttk

    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_tkagg import FigureCanvasTkAgg
    from matplotlib.widgets import PolygonSelector
    from PIL import Image, ImageTk

    pts = _tsne_2d(embeddings, random_state)

    root = tk.Tk()
    root.title("Interactive t-SNE with Images")
    fig, ax = plt.subplots(figsize=(10, 10))
    color_map, unique = _color_map(labels, colors)
    scatter = ax.scatter(
        pts[:, 0], pts[:, 1], c=[color_map[int(l)] for l in labels], picker=True
    )
    ax.legend(
        handles=scatter.legend_elements()[0],
        labels=[classes[int(l)] for l in unique],
    )

    img_label = tk.Label(root)
    img_label.grid(row=0, column=1, sticky="nsew")
    label_text = tk.StringVar()
    tk.Label(root, textvariable=label_text).grid(row=1, column=1, sticky="nsew")
    inside_points_label = tk.StringVar()
    tk.Label(root, textvariable=inside_points_label).grid(
        row=2, column=0, columnspan=2, sticky="nsew"
    )
    if num_clusters is not None:
        tk.Label(root, text=f"Number of clusters: {num_clusters}").grid(
            row=3, column=0, columnspan=2, sticky="nsew"
        )

    def onpick(event):
        ind = event.ind[0]
        img = Image.open(img_paths[ind]).resize((400, 400), Image.LANCZOS)
        img_tk = ImageTk.PhotoImage(img)
        img_label.configure(image=img_tk)
        img_label.image = img_tk
        label_text.set(f"Label: {classes[int(labels[ind])]}")

    def on_key(event):
        if event.key == "z":
            zoom(event.xdata, event.ydata, 0.9)
        elif event.key == "a":
            zoom(event.xdata, event.ydata, 1.1)

    def zoom(x, y, factor):
        if x is None or y is None:
            return
        xlim, ylim = ax.get_xlim(), ax.get_ylim()
        ax.set_xlim([x - (x - xlim[0]) * factor, x + (xlim[1] - x) * factor])
        ax.set_ylim([y - (y - ylim[0]) * factor, y + (ylim[1] - y) * factor])
        fig.canvas.draw()

    fig.canvas.mpl_connect("pick_event", onpick)
    fig.canvas.mpl_connect("key_press_event", on_key)

    canvas = FigureCanvasTkAgg(fig, master=root)
    canvas.draw()
    canvas.get_tk_widget().grid(row=0, column=0, rowspan=2, sticky="nsew")
    for c in range(2):
        root.grid_columnconfigure(c, weight=1)
    for r in range(4):
        root.grid_rowconfigure(r, weight=1)

    state = {"selector": None, "cleared": True}
    polygon: List = []

    def enable_polygon_selector(event):
        if event.button == 3 and (state["selector"] is None or state["cleared"]):
            state["selector"] = PolygonSelector(ax, onselect=onselect, useblit=True)
            state["cleared"] = False
            print("Polygon selector enabled.")

    def onselect(verts):
        polygon.clear()
        polygon.extend(verts)

    def analyze():
        if len(polygon) < 3:
            print("Polygon not closed. Select at least 3 points.")
            return
        inside, _ = analyze_polygon_points(pts, polygon, labels, classes, img_paths, save_dir)
        inside_points_label.set(f"Points inside polygon: {len(inside)}")
        dropdown["values"] = [f"{p['path']} ({p['class']})" for p in inside]
        if inside:
            dropdown.current(0)

    def clear():
        polygon.clear()
        if state["selector"] is not None:
            state["selector"].disconnect_events()
            state["selector"].set_visible(False)
            state["selector"] = None
        while ax.patches:
            ax.patches.pop().remove()
        fig.canvas.draw()
        inside_points_label.set("")
        label_text.set("")
        state["cleared"] = True

    fig.canvas.mpl_connect("button_press_event", enable_polygon_selector)
    tk.Button(root, text="Close Polygon", command=analyze).grid(row=4, column=0, sticky="ew")
    tk.Button(root, text="Clear Polygon", command=clear).grid(row=4, column=1, sticky="ew")
    dropdown = ttk.Combobox(root)
    dropdown.grid(row=6, column=0, columnspan=2, sticky="ew")
    root.mainloop()
