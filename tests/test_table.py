"""Table structure decode / assignment tests (reference:
table_structure_decode.rs + stitching.rs cell logic)."""

import numpy as np

from oar_ocr_ray.table import (
    assign_ocr_to_cells,
    attach_formulas_to_cells,
    parse_cell_grid_info,
    render_table_html,
)


def test_grid_simple_colspan():
    tokens = ["<tr>", "<td></td>", '<td colspan="2"></td>', "</tr>",
              "<tr>", "<td></td>", "<td></td>", "<td></td>", "</tr>"]
    grid = parse_cell_grid_info(tokens)
    assert [(c["row"], c["col"], c["row_span"], c["col_span"]) for c in grid] == [
        (0, 0, 1, 1), (0, 1, 1, 2), (1, 0, 1, 1), (1, 1, 1, 1), (1, 2, 1, 1)
    ]


def test_grid_rowspan_occupancy():
    tokens = ["<tr>", '<td rowspan="2"></td>', "<td></td>", "</tr>",
              "<tr>", "<td></td>", "</tr>"]
    grid = parse_cell_grid_info(tokens)
    # second-row cell must skip col 0 (occupied by the rowspan)
    assert [(c["row"], c["col"]) for c in grid] == [(0, 0), (0, 1), (1, 1)]


def test_grid_split_td_tokens():
    tokens = ["<tr>", "<td", ' colspan="2"', ">", "</td>", "<td></td>", "</tr>"]
    grid = parse_cell_grid_info(tokens)
    assert [(c["row"], c["col"], c["col_span"]) for c in grid] == [(0, 0, 2), (0, 2, 1)]


def test_render_html_with_content():
    tokens = ["<tr>", "<td></td>", "<td></td>", "</tr>"]
    html = render_table_html(tokens, ["Cell 1", "Cell 2"])
    assert html.startswith("<html><body><table>")
    assert "<td>Cell 1</td>" in html and "<td>Cell 2</td>" in html
    assert html.endswith("</table></body></html>")
    # without content: empty cells
    assert "<td></td>" in render_table_html(tokens)


def test_render_html_attrs_preserved():
    tokens = ["<tr>", '<td colspan="2"></td>', "</tr>"]
    html = render_table_html(tokens, ["X"])
    assert '<td colspan="2">X</td>' in html


def test_assign_ocr_to_cells():
    cells = np.array([[0, 0, 50, 50], [50, 0, 100, 50]])
    ocr = np.array([[10, 10, 40, 40], [60, 10, 90, 40], [200, 200, 210, 210]])
    out = assign_ocr_to_cells(ocr, cells)
    assert out.tolist() == [0, 1, -1]


def test_assign_prefers_higher_iou_then_distance():
    cells = np.array([[0, 0, 50, 50], [0, 0, 100, 100]])
    ocr = np.array([[5, 5, 45, 45]])
    # IoU with cell 0 (0.64) > IoU with cell 1 (0.16) -> cell 0
    assert assign_ocr_to_cells(ocr, cells).tolist() == [0]


def test_attach_formulas():
    cells = np.array([[0, 0, 50, 50], [50, 0, 100, 50]])
    out = attach_formulas_to_cells(
        np.array([[10, 10, 40, 40], [0.5, 0.5, 1.0, 1.0]]),
        ["x^2", "ignored-degenerate"],
        cells, ["existing", ""],
    )
    assert out == ["existing $x^2$", ""]
    # already-wrapped latex not double-wrapped
    out = attach_formulas_to_cells(np.array([[60, 10, 90, 40]]), ["$y$"], cells, ["", ""])
    assert out == ["", "$y$"]
