"""Execution evidence for the two display-bound GUI bodies.

The interactive t-SNE *controller* and the camera *pipeline* are already
unit-tested headlessly; what had never executed anywhere (no $DISPLAY, no
Xvfb in the image) were the literal widget-wiring lines:

- `plot_tsne_interactive`'s Tk body (reference GUI
  functions/functions_RESNET50_Truncate.py:447-617) — driven here by
  injecting fake `tkinter` / `tkinter.ttk` / `FigureCanvasTkAgg` /
  `PIL.ImageTk` modules that record every widget, then exercising the
  wired-up controller through the recorded Button commands.
- `run_camera`'s fullscreen display branch (reference
  functions/functions_RESNET50_Truncate.py:265-353) — driven by
  monkeypatching cv2's highgui calls (namedWindow/setWindowProperty/
  setMouseCallback/imshow/waitKey/destroyAllWindows) with recording fakes
  over a real video-file source, including the click-to-toggle-fullscreen
  callback and the 'q'-to-quit path.

These are test doubles for the display server only; every line of OUR code
in both bodies executes.
"""
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# fake tkinter stack
# ---------------------------------------------------------------------------
def _build_fake_tk(registry):
    tk = types.ModuleType("tkinter")

    class Widget:
        def __init__(self, master=None, **kw):
            self.master = master
            self.kw = dict(kw)
            self.configured = []
            registry.setdefault(type(self).__name__, []).append(self)

        def grid(self, **kw):
            self.grid_kw = kw

        def configure(self, **kw):
            self.configured.append(kw)
            self.kw.update(kw)

    class Tk(Widget):
        def __init__(self):
            super().__init__()
            self.titles = []
            self.mainloop_calls = 0

        def title(self, t):
            self.titles.append(t)

        def grid_columnconfigure(self, c, **kw):
            pass

        def grid_rowconfigure(self, r, **kw):
            pass

        def mainloop(self):
            self.mainloop_calls += 1

    class StringVar:
        def __init__(self):
            self.value = ""
            registry.setdefault("StringVar", []).append(self)

        def set(self, v):
            self.value = v

        def get(self):
            return self.value

    class Label(Widget):
        pass

    class Button(Widget):
        pass

    tk.Tk, tk.Label, tk.Button, tk.StringVar = Tk, Label, Button, StringVar

    ttk = types.ModuleType("tkinter.ttk")

    class Combobox(Widget):
        def __init__(self, master=None, **kw):
            super().__init__(master, **kw)
            self.values = None
            self.current_idx = None

        def __setitem__(self, key, value):
            if key == "values":
                self.values = list(value)

        def current(self, i):
            self.current_idx = i

    ttk.Combobox = Combobox
    tk.ttk = ttk

    tkagg = types.ModuleType("matplotlib.backends.backend_tkagg")

    class FigureCanvasTkAgg:
        def __init__(self, fig, master=None):
            self.fig = fig
            self.drawn = False
            registry.setdefault("FigureCanvasTkAgg", []).append(self)

        def draw(self):
            self.drawn = True

        def get_tk_widget(self):
            return tk.Label(None)

    tkagg.FigureCanvasTkAgg = FigureCanvasTkAgg

    imagetk = types.ModuleType("PIL.ImageTk")

    class PhotoImage:
        def __init__(self, img):
            self.img = img
            registry.setdefault("PhotoImage", []).append(self)

    imagetk.PhotoImage = PhotoImage
    return tk, ttk, tkagg, imagetk


class TestTsneTkWiring:
    def test_plot_tsne_interactive_tk_body(self, tiny_imagefolder, tmp_path, monkeypatch):
        """The Tk body of plot_tsne_interactive executes end-to-end against
        fake widgets: window built, canvas drawn, controller wired, and the
        Button commands / TkView methods drive real picks, polygon analysis
        (JSON artifacts + dropdown fill) and clear."""
        import matplotlib

        matplotlib.use("Agg", force=True)

        from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
        from heuristique_style_transfer_code_tpu.tasks import tsne as tsne_mod

        registry = {}
        tk, ttk, tkagg, imagetk = _build_fake_tk(registry)
        monkeypatch.setitem(sys.modules, "tkinter", tk)
        monkeypatch.setitem(sys.modules, "tkinter.ttk", ttk)
        monkeypatch.setitem(sys.modules, "matplotlib.backends.backend_tkagg", tkagg)
        monkeypatch.setitem(sys.modules, "PIL.ImageTk", imagetk)
        monkeypatch.setenv("DISPLAY", ":99")  # take the interactive branch

        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        n = 10
        paths, labels = idx.paths[:n], np.asarray(idx.labels[:n])
        rng = np.random.RandomState(0)
        # class-separated embeddings so t-SNE is stable and fast
        emb = rng.randn(n, 8).astype(np.float32) + labels[:, None] * 5.0
        classes = ["fog", "rain", "snow", "sun"]

        tsne_mod.plot_tsne_interactive(
            emb, labels, classes, paths, num_clusters=3, save_dir=str(tmp_path)
        )

        # window built and event loop entered
        root = registry["Tk"][0]
        assert root.titles == ["Interactive t-SNE with Images"]
        assert root.mainloop_calls == 1
        canvas = registry["FigureCanvasTkAgg"][0]
        assert canvas.drawn
        # num_clusters label rendered
        assert any(
            w.kw.get("text") == "Number of clusters: 3" for w in registry["Label"]
        )

        # recover the wired controller through the Button commands
        buttons = {b.kw["text"]: b.kw["command"] for b in registry["Button"]}
        assert set(buttons) == {"Close Polygon", "Clear Polygon"}
        ctl = buttons["Close Polygon"].__self__
        assert canvas.fig is ctl.fig

        # pick -> TkView.set_image/set_label: PhotoImage created, img_label
        # configured, StringVar set
        ctl.onpick(SimpleNamespace(ind=[0]))
        img_label, label_var = registry["Label"][0], registry["StringVar"][0]
        photo = registry["PhotoImage"][-1]
        assert photo.img.size == (400, 400)
        assert img_label.configured[-1] == {"image": photo}
        assert img_label.image is photo
        assert label_var.value == f"Label: {classes[labels[0]]}"

        # polygon covering the whole plane -> every point inside
        x0, x1 = ctl.ax.get_xlim()
        y0, y1 = ctl.ax.get_ylim()
        big = 10 * max(abs(x0), abs(x1), abs(y0), abs(y1), 1.0)
        ctl.onselect([(-big, -big), (big, -big), (big, big), (-big, big)])
        buttons["Close Polygon"]()  # the literal Tk Button command
        inside_var = registry["StringVar"][1]
        assert inside_var.value == f"Points inside polygon: {n}"
        dropdown = registry["Combobox"][0]
        assert len(dropdown.values) == n and dropdown.current_idx == 0
        assert dropdown.values[0] == f"{paths[0]} ({classes[labels[0]]})"
        for f in ("inside_polygon.json", "outside_polygon.json"):
            assert os.path.exists(os.path.join(str(tmp_path), f))

        # clear via the other Button
        buttons["Clear Polygon"]()
        assert inside_var.value == "" and label_var.value == ""
        assert ctl.polygon == []


class TestCameraDisplayPath:
    def test_fullscreen_display_branch(self, tmp_path, family1, monkeypatch):
        """run_camera's display branch: fullscreen window setup, letterboxed
        overlay frames to imshow, click-to-toggle-fullscreen mouse callback,
        and the 'q' quit path — cv2 highgui faked, everything else real."""
        import cv2

        from heuristique_style_transfer_code_tpu.tasks.camera import run_camera

        cfg, variables, forward_eval = family1
        video_path = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(8):
            w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()

        rec = {"named": [], "props": [], "imshow": [], "waitkeys": 0,
               "destroyed": False, "mouse_cb": None}
        monkeypatch.setattr(cv2, "namedWindow", lambda name, flag: rec["named"].append((name, flag)))
        monkeypatch.setattr(cv2, "setWindowProperty", lambda name, prop, val: rec["props"].append(val))
        monkeypatch.setattr(cv2, "setMouseCallback", lambda name, cb: rec.__setitem__("mouse_cb", cb))
        monkeypatch.setattr(cv2, "imshow", lambda name, canvas: rec["imshow"].append(canvas))

        def fake_wait_key(ms):
            rec["waitkeys"] += 1
            return ord("q") if rec["waitkeys"] >= 3 else 255

        monkeypatch.setattr(cv2, "waitKey", fake_wait_key)
        monkeypatch.setattr(cv2, "destroyAllWindows", lambda: rec.__setitem__("destroyed", True))

        logs = []
        summary = run_camera(
            forward_eval, variables, ["fog", "rain", "snow", "sun"],
            save_dir=str(tmp_path), camera_index=video_path, max_frames=8,
            display=True, log_fn=logs.append,
        )

        # 'q' on the 3rd displayed frame stops the loop early
        assert summary["frames"] == 3 and rec["waitkeys"] == 3
        assert rec["destroyed"]

        # fullscreen window created and set fullscreen before any frame
        assert rec["named"] == [("Camera", cv2.WND_PROP_FULLSCREEN)]
        assert rec["props"][0] == cv2.WINDOW_FULLSCREEN

        # letterboxed canvases match the selected resolution and carry the
        # overlay text (non-black pixels beyond the raw 48x64 frame)
        res_line = [l for l in logs if l.startswith("Selected resolution: ")][0]
        sw, sh = map(int, res_line.split(": ")[1].split("x"))
        assert len(rec["imshow"]) == 3
        for canvas in rec["imshow"]:
            assert canvas.shape == (sh, sw, 3) and canvas.dtype == np.uint8
        # aspect 64x48 on e.g. 16:9 -> vertical black bars left/right
        assert rec["imshow"][0][:, :4].max() == 0

        # the mouse callback toggles fullscreen on left click
        n_props = len(rec["props"])
        rec["mouse_cb"](cv2.EVENT_LBUTTONDOWN, 0, 0, 0, None)
        rec["mouse_cb"](cv2.EVENT_LBUTTONDOWN, 0, 0, 0, None)
        assert rec["props"][n_props:] == [cv2.WINDOW_NORMAL, cv2.WINDOW_FULLSCREEN]
        # non-click events are ignored
        rec["mouse_cb"](cv2.EVENT_MOUSEMOVE, 0, 0, 0, None)
        assert len(rec["props"]) == n_props + 2
