SELECT CAST(cell AS INT) AS cell, CAST(cell_rows AS BIGINT) AS cell_rows
FROM (VALUES
(0,108),
(1,153),
(3,56),
(5,1),
(8,56),
(9,48),
(12,106),
(13,24)
) AS t(cell, cell_rows)
ORDER BY cell