SELECT CAST(cell AS INT) AS cell, CAST(cell_rows AS BIGINT) AS cell_rows
FROM (VALUES
(0,40),
(1,36),
(3,63),
(5,1),
(8,63),
(9,57),
(12,32),
(13,28),
(16,30),
(17,27),
(18,60),
(19,32),
(20,26),
(21,32),
(22,53),
(23,29),
(24,37),
(25,29),
(26,40),
(27,38),
(28,19),
(29,28)
) AS t(cell, cell_rows)
ORDER BY cell