"""GUI keyboard state machine (openpose_tpu.render.gui, headless)."""

from openpose_tpu.render.gui import GuiState, handle_key


def k(c):
    return ord(c)


class TestHandleKey:
    def test_quit_keys(self):
        assert not handle_key(GuiState(), 27).running
        assert not handle_key(GuiState(), k("q")).running
        st = GuiState(paused=True)
        st = handle_key(st, 27)
        assert not st.running and not st.paused

    def test_pause_toggle(self):
        st = handle_key(GuiState(), k(" "))
        assert st.paused
        assert not handle_key(st, k(" ")).paused

    def test_fullscreen_toggle(self):
        st = handle_key(GuiState(), k("f"))
        assert st.fullscreen

    def test_seek(self):
        st = handle_key(GuiState(), k("l"))
        assert st.seek_delta == 30
        st = handle_key(st, k("k"))
        assert st.seek_delta == -30
        st = handle_key(GuiState(), k("m"))       # frame-step mode
        st = handle_key(st, k("l"))
        assert st.seek_delta == 1

    def test_element_cycle(self):
        st = handle_key(GuiState(), k("."))
        assert st.part_to_show == -1              # all-part heatmap
        st = handle_key(st, k("."))
        assert st.part_to_show == -2              # PAF
        st = handle_key(st, k(","))
        assert st.part_to_show == -1

    def test_direct_elements(self):
        assert handle_key(GuiState(), k("2")).part_to_show == -1
        assert handle_key(GuiState(), k("4")).part_to_show == -2
        assert handle_key(GuiState(), k("1")).part_to_show == 0
        assert handle_key(GuiState(), k("5")).part_to_show == 1
        assert handle_key(GuiState(), k("0")).part_to_show == 6

    def test_toggles_and_threshold(self):
        st = handle_key(GuiState(), k("z"))
        assert not st.face_enabled
        st = handle_key(st, k("x"))
        assert not st.hand_enabled
        st = handle_key(st, k("b"))
        assert not st.blend
        st = handle_key(st, k("-"))
        st = handle_key(st, k("-"))
        st = handle_key(st, k("="))
        assert abs(st.nms_threshold_delta + 0.005) < 1e-9

    def test_no_key(self):
        st = GuiState()
        assert handle_key(st, -1) is st
