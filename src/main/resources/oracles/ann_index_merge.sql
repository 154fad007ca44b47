SELECT CAST(cell AS INT) AS cell, CAST(cell_rows AS BIGINT) AS cell_rows
FROM (VALUES
(0,1000),
(1,177),
(3,66),
(8,70),
(9,62),
(12,125)
) AS t(cell, cell_rows)
ORDER BY cell