SELECT CAST(cell AS INT) AS cell, CAST(cell_rows AS BIGINT) AS cell_rows
FROM (VALUES
(1,238),
(3,70),
(8,32),
(9,19),
(12,123),
(13,18)
) AS t(cell, cell_rows)
ORDER BY cell